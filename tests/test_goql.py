"""GOQL-lite compiler tests — mirroring the matcher regression corpus
(reference test/match/MatcherCompiler_test.cpp)."""

import pytest

from libgeodesk_spark.functions.goql import compile_goql, goql_filter


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        # id, amenity, name, maxspeed, type
        (1, "pub", "The Old Crown", "30", "node"),
        (2, "pub", "no", None, "node"),
        (3, "restaurant", "Crown Plaza", "50", "way"),
        (4, None, "crowned", "80.5", "way"),
        (5, "no", "Speedy", None, "relation"),
        (6, "cafe", None, "bad", "area"),
    ]
    return spark.createDataFrame(
        rows, "id int, amenity string, name string, maxspeed string, type string")


def ids(df, q, **kw):
    return sorted(r.id for r in goql_filter(df, q, **kw).select("id").collect())


class TestClauses:
    def test_key_present(self, df):
        # [amenity]: present and != 'no' (MatcherParser.cpp:129-135)
        assert ids(df, "*[amenity]") == [1, 2, 3, 6]

    def test_key_absent(self, df):
        assert ids(df, "*[!amenity]") == [4, 5]

    def test_eq(self, df):
        assert ids(df, "*[amenity=pub]") == [1, 2]

    def test_eq_list(self, df):
        assert ids(df, "*[amenity=pub,cafe]") == [1, 2, 6]

    def test_ne(self, df):
        # != accepts missing keys (reference negative-clause semantics)
        assert ids(df, "*[amenity!=pub]") == [3, 4, 5, 6]

    def test_wildcards(self, df):
        assert ids(df, "*[name=*Crown]") == [1]      # ends-with
        assert ids(df, "*[name=Crown*]") == [3]      # starts-with
        assert ids(df, "*[name=*rown*]") == [1, 3, 4]  # contains

    def test_regex(self, df):
        assert ids(df, '*[name~"[Cc]rown.*"]') == [3, 4]
        # negated regex accepts missing keys (MatcherParser.cpp:139 sets
        # KEY_REQUIRED only for non-negated clauses) — null name INCLUDED
        assert ids(df, '*[name!~"[Cc]rown.*"]') == [1, 2, 5, 6]

    def test_numeric(self, df):
        # string→number coercion incl. '80.5'; 'bad' fails try_cast
        assert ids(df, "*[maxspeed>40]") == [3, 4]
        assert ids(df, "*[maxspeed<=30]") == [1]
        assert ids(df, "*[maxspeed>=30]") == [1, 3, 4]

    def test_numeric_eq(self, df):
        assert ids(df, "*[maxspeed=30]") == [1]

    def test_and_clauses(self, df):
        assert ids(df, "*[amenity=pub][maxspeed]") == [1]

    def test_or_selectors(self, df):
        assert ids(df, "*[amenity=cafe], *[maxspeed=50]") == [3, 6]

    def test_type_letters(self, df):
        assert ids(df, "n[amenity]", type_col="type") == [1, 2]
        assert ids(df, "wa[name=*rown*]", type_col="type") == [3, 4]
        assert ids(df, "nwar[amenity]", type_col="type") == [1, 2, 3, 6]

    def test_empty_value_list_regression(self, df):
        # [k=a,b] with mixed quoted values (geodesk-py#62-style corner)
        assert ids(df, '*[amenity="pub","cafe"]') == [1, 2, 6]


class TestPlan:
    def test_compiles_to_single_expression(self, df):
        # the whole matcher is one Catalyst filter — no UDFs/BatchEvalPython
        plan = df.filter(compile_goql("*[amenity=pub][maxspeed>20]")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "Filter" in plan


class TestTagsModel:
    def test_map_column_resolver(self, spark):
        """The OSM-faithful dynamic tag model: map<string,string> column,
        absent keys behave exactly like missing tags."""
        from pyspark.sql import functions as F

        from libgeodesk_spark.functions.goql import goql_filter
        rows = [
            (1, {"amenity": "pub", "name": "The Ox"}),
            (2, {"amenity": "cafe"}),
            (3, {"name": "Nameless"}),
            (4, {"amenity": "pub", "disused": "yes"}),
        ]
        df = spark.createDataFrame(rows, "fid long, tags map<string,string>")

        def ids(q):
            return sorted(r.fid for r in
                          goql_filter(df, q, tags_col="tags").collect())

        assert ids("*[amenity=pub]") == [1, 4]
        assert ids("*[amenity=pub][!disused]") == [1]
        assert ids("*[!amenity]") == [3]
        assert ids("*[name]") == [1, 3]
        assert ids("*[amenity=pub,cafe]") == [1, 2, 4]
        assert ids("*[name=*Ox]") == [1]
