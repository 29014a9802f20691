"""Driver-contract guard (VERDICT r4 "do this" #2): every queries() entry
must have an oracle_sql() twin registered BEFORE the driver's correctness
gate runs — q51–q53 were committed after round 4's gate and so missed
their CORRECTNESS rows despite being green. This test makes that class of
gap impossible to reintroduce silently.

No SparkSession needed — it only inspects the registries.
"""

import re

import __spark_entry__ as entry

# queries whose semantics are not SQL-expressible get a weaker rows-only
# driver check; every such exception must be listed (currently none —
# even the streaming clock q43 has an exact SQL replay).
NON_SQL_QUERIES: set[str] = set()


def test_every_query_has_an_oracle():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    missing = qs - oracles - NON_SQL_QUERIES
    assert not missing, f"queries without an oracle_sql twin: {sorted(missing)}"


def test_no_orphan_oracles():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    orphans = oracles - qs
    assert not orphans, f"oracle_sql entries with no query: {sorted(orphans)}"


def test_query_names_are_well_formed():
    """The driver sorts and reports by name — enforce the qNN_slug shape
    and unique numbering so the suite stays navigable."""
    names = sorted(entry.queries())
    nums = [re.match(r"^q(\d{2,3})_[a-z0-9_]+$", n) for n in names]
    assert all(nums), [n for n, m in zip(names, nums) if not m]
    ids = [int(m.group(1)) for m in nums]
    assert len(ids) == len(set(ids)), "duplicate query numbers"
