"""Driver-contract invariants for __spark_entry__ (no Spark needed):
the oracle board can only grow, every oracle key has a query, and every
query is callable."""

import sys


def test_entry_contract():
    sys.path.insert(0, ".")
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) >= 53, len(qs)
    assert len(oracles) >= 52, len(oracles)
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    rows_only = set(qs) - set(oracles)
    # the ONLY intentional rows-only entry (xxhash64 hamming balls are
    # not SQL-computable; pinned by the planted-fixture pytest instead)
    assert rows_only == {"simhash_pairs"}, rows_only
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
