"""Red-team the composite driver contract (VERDICT r5 next-round #6).

The consolidation claim (peri_spark/composite.py) is that folding member
queries into a UNION-ALL family row NEVER weakens the check: one red
member reddens its family row at the driver surface, and the local
full-registry parity suite names the exact member.  This test proves the
claim end-to-end by deliberately perturbing ONE member's oracle SQL (a
value-level corruption, +1 on a BIGINT output column — the subtlest
class the value-hash gate must catch, not a rowcount or schema break)
and asserting BOTH detection layers fire:

1. member layer — ``compare`` over the full registry fails and its
   message carries the member's name (what ``test_query_matches_oracle``
   parametrization surfaces);
2. driver layer — the SAME composite callable the driver records,
   checked against the family UNION-ALL oracle rebuilt with the
   perturbed member, fails (the family row goes red, never vanishes).

The real registries are never mutated — perturbation lives in copies.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from peri_spark import composite  # noqa: E402

from test_entry_oracle import compare, duck  # noqa: E402,F401  (fixture)

FAMILY = "directives_combinators"
MEMBER = "oneof_nation"          # 25-row nation input: cheapest member


def _perturbed_oracles():
    """Copy of the full oracle registry with MEMBER's BIGINT output
    column off by one — schema and rowcount stay identical, only the
    value hash can catch it."""
    oracles = dict(entrymod.oracle_sql_full())
    spec = composite.SPECS[MEMBER]
    long_cols = [c for c, k in spec if k in ("l", "b")]
    assert long_cols, f"{MEMBER} spec has no integral column to perturb"
    sel = []
    for col, kind in spec:
        if col == long_cols[0]:
            sel.append(f'CAST("{col}" AS BIGINT) + 1 AS "{col}"')
        else:
            sel.append(f'"{col}"')
    oracles[MEMBER] = ("SELECT " + ", ".join(sel)
                       + f" FROM (\n{oracles[MEMBER]}\n) AS __rt")
    return oracles


def test_member_layer_names_the_culprit(spark, duck):  # noqa: F811
    """Layer 1: the full-registry parity check fails ON THE MEMBER."""
    oracles = _perturbed_oracles()
    with pytest.raises(AssertionError, match=MEMBER):
        compare(spark, duck, MEMBER, entrymod.queries_full(), oracles)
    # sanity: the unperturbed member still passes in the same session
    compare(spark, duck, MEMBER,
            entrymod.queries_full(), entrymod.oracle_sql_full())


def test_driver_layer_family_row_goes_red(spark, duck):  # noqa: F811
    """Layer 2: the DRIVER-surface composite row reddens — the exact
    callable queries() hands the driver, against the family oracle
    rebuilt with one corrupt member."""
    members = list(entrymod.COMPOSITES[FAMILY])
    assert MEMBER in members
    bad_sql = composite.composite_oracle_sql(members, _perturbed_oracles())
    family_q = entrymod.queries()[FAMILY]
    with pytest.raises(AssertionError, match=FAMILY):
        compare(spark, duck, FAMILY, {FAMILY: family_q}, {FAMILY: bad_sql})
    # and the family row is green with the honest oracle
    compare(spark, duck, FAMILY, {FAMILY: family_q},
            {FAMILY: entrymod.oracle_sql()[FAMILY]})
