"""Targeted sweep merge: run tools/drive_contract.py for the named
queries only and merge their rows into the newest committed
CONTRACT_FULL_r*.json, keeping the artifact current as queries are added
mid-round (the full regeneration still runs as the last pre-snapshot
step; this keeps tests/test_sweep_guard.py green in between).

Usage: python tools/update_sweep.py q_new_one q_new_two
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_sweep import newest_artifact  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: python tools/update_sweep.py <query> [query ...]")
        return 2
    artifact = newest_artifact()
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        tmp = tf.name
    env = dict(os.environ, CONTRACT_JSON=tmp)
    rc = subprocess.call(
        [sys.executable, "tools/drive_contract.py",
         "/root/testdata/sf0.01", *names],
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if rc != 0:
        print("drive_contract failed; artifact NOT updated")
        return rc
    part = json.load(open(tmp))
    os.unlink(tmp)
    data = json.load(open(artifact))
    data["results"].update(part["results"])
    data["n_queries"] = len(data["results"])
    data["failures"] = [n for n, r in data["results"].items()
                        if r["status"] not in ("MATCH", "ROWS-ONLY",
                                               "PY-MATCH")]
    with open(artifact, "w") as f:
        json.dump(data, f, indent=1)
    print(f"merged {len(part['results'])} rows into "
          f"{os.path.basename(artifact)} (now {data['n_queries']} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
