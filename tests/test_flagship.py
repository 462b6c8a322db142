"""Golden tests for the flagship min-unique-prefix query (ref main.cpp),
on synthetic emails-shaped fixtures with independently computed answers
(FIXTURES.md §A; the reference's shipped data yields 9 and 3 — our
fixtures reproduce the same structural cases with known goldens).
"""

from __future__ import annotations

import pytest

from spark_graft.compat.mapreduce import min_unique_prefix_mr
from spark_graft.operators.relational import min_unique_prefix_len


def py_min_unique_prefix(strings: list[str]) -> int | None:
    """Independent reference implementation (pure python) of
    main.cpp:28-68 semantics incl. substr clamping."""
    if not strings:
        return None
    for length in range(1, max(len(s) for s in strings) + 1):
        prefixes = [s[:length] for s in strings]
        if len(set(prefixes)) == len(prefixes):
            return length
    return None


# 5 lines, collision at len 2 ('ad') -> expect 3, mirroring emails_short.txt
SHORT = ["adillon@x.com", "adams@y.org", "bob@z.net", "carol@w.io", "dave@v.dev"]
assert py_min_unique_prefix(SHORT) == 3

# 100-line-style case: two addresses colliding through len 8 -> expect 9
LONG = [f"user{i:03d}@mail.com" for i in range(50)] + [
    "adillon1@a.com",
    "adillon2@b.com",  # collide through 'adillon' (len 7) -> need 8
    "parents7@c.com",
    "parents8@d.com",  # collide through 'parents' -> need 8
]
EXPECTED_LONG = py_min_unique_prefix(LONG)


@pytest.mark.parametrize(
    "strings,expected",
    [
        (SHORT, 3),
        (LONG, EXPECTED_LONG),
        (["a", "b", "c"], 1),  # all-distinct-at-len-1 fast path
        (["ab", "abc"], 3),  # short string clamps: 'ab'[:3] == 'ab' != 'abc'
        (["same", "same"], None),  # exact dups: no finite prefix (ref loops forever)
        ([], None),
    ],
)
def test_dataframe_flagship(spark, strings, expected):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    assert min_unique_prefix_len(spark, df, "s") == expected
    assert py_min_unique_prefix(strings) == expected


@pytest.mark.parametrize("strings,expected", [(SHORT, 3), (LONG, EXPECTED_LONG)])
def test_compat_shim_flagship(spark, strings, expected):
    """The RDD shim's iterative driver produces the same answers."""
    max_len = max(len(s) for s in strings)
    assert min_unique_prefix_mr(spark, strings, max_len) == expected


@pytest.mark.parametrize(
    "strings",
    [
        SHORT,
        LONG,
        ["a", "b", "c"],  # answer 1: gallop's very first probe succeeds
        ["ab", "abc"],  # clamping case, answer 3 == max_len (bracket hits cap)
        ["same", "same"],  # no finite answer: gallop must fail through max_len
        ["x"],  # single record, answer 1
        ["aa", "ab", "b"],  # answer 2: exercises the binary-search midpoint
    ],
)
def test_bsearch_driver_matches_linear(spark, strings):
    """min_unique_prefix_mr_bsearch == the linear reference driver on
    every structural case: monotonicity of the convergence predicate is
    what licenses the O(log answer) driver in udf_compat_iterative."""
    from spark_graft.compat.mapreduce import min_unique_prefix_mr_bsearch

    max_len = max(len(s) for s in strings)
    assert min_unique_prefix_mr_bsearch(
        spark, strings, max_len
    ) == min_unique_prefix_mr(spark, strings, max_len)


def test_flagship_matches_between_engines(spark, sf_dir):
    """DataFrame loop == compat shim == pure python on real data."""
    from spark_graft.sources import table

    names = [r[0] for r in table(spark, sf_dir, "customer").select("c_name").collect()]
    expected = py_min_unique_prefix(names)
    df = spark.createDataFrame([(s,) for s in names], "s string")
    assert min_unique_prefix_len(spark, df, "s") == expected
    assert min_unique_prefix_mr(spark, names, max(len(s) for s in names)) == expected
