"""Driver-contract consistency guards."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_queries_documented_and_callable():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name
        assert fn.__doc__, f"{name} needs a docstring (judge-facing spec)"


def test_contract_shape():
    assert callable(entrymod.entry)
    assert len(entrymod.queries()) >= 25
    # the vast majority of the surface must be oracle-checked
    ratio = len(entrymod.oracle_sql()) / len(entrymod.queries())
    assert ratio >= 0.8, f"oracle coverage ratio {ratio:.2f}"
