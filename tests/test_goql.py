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


class TestGoqlPropertyModel:
    """Randomized (seeded) equivalence against an INDEPENDENT Python
    model of the documented semantics (P1-P8: present excludes value
    'no'; =/!= with value lists, wildcards, string→number duality;
    negated ops accept missing keys; regex is full-match). The driver's
    DuckDB oracle pins two fixed queries — this pins the PARSER across
    hundreds of generated ones, all evaluated in ONE Spark job."""

    KEYS = ["lang", "source", "n", "amenity", "name_x"]
    VALUES = ["yes", "no", "3", "42", "-2", "3.5", "x1", "src1a", "cafe", ""]

    @staticmethod
    def _model_clause(tags, clause):
        import re as _re
        NUM = _re.compile(r"^-?\d+(\.\d+)?$")
        clause = clause.strip()
        if clause.startswith("!"):
            v = tags.get(clause[1:].strip())
            return v is None or v == "no"
        m = _re.match(r"^([A-Za-z_][\w:]*)\s*(!~|~|!=|>=|<=|=|>|<)?\s*(.*)$",
                      clause)
        key, op, rhs = m.group(1), m.group(2), m.group(3).strip()
        v = tags.get(key)
        if not op:
            return v is not None and v != "no"
        if op in ("~", "!~"):
            pat = rhs.strip("\"'")
            hit = v is not None and _re.fullmatch(pat, v) is not None
            return hit if op == "~" else (v is None or not hit)
        if op in (">", ">=", "<", "<="):
            try:
                num = float(v)
            except (TypeError, ValueError):
                return False
            n = float(rhs)
            return {"<": num < n, "<=": num <= n,
                    ">": num > n, ">=": num >= n}[op]
        hits = []
        for raw in [x.strip() for x in rhs.split(",") if x.strip()]:
            val = raw.strip("\"'")
            if NUM.match(raw):
                try:
                    hits.append(float(v) == float(raw))
                except (TypeError, ValueError):
                    hits.append(False)
            elif val.startswith("*") and val.endswith("*") and len(val) > 1:
                hits.append(v is not None and val[1:-1] in v)
            elif val.endswith("*"):
                hits.append(v is not None and v.startswith(val[:-1]))
            elif val.startswith("*"):
                hits.append(v is not None and v.endswith(val[1:]))
            else:
                hits.append(v is not None and v == val)
        any_hit = any(hits)
        if op == "!=":
            return v is None or not any_hit
        return v is not None and any_hit

    def _gen_queries(self, rng, n):
        out = []
        for _ in range(n):
            clauses = []
            for _ in range(rng.randint(1, 3)):
                k = rng.choice(self.KEYS)
                kind = rng.randrange(7)
                if kind == 0:
                    clauses.append(k)
                elif kind == 1:
                    clauses.append("!" + k)
                elif kind == 2:
                    vals = ",".join(rng.choice(self.VALUES[:-1])
                                    for _ in range(rng.randint(1, 3)))
                    clauses.append(f"{k}{rng.choice(['=', '!='])}{vals}")
                elif kind == 3:
                    v = rng.choice(["x1", "src1a", "cafe", "yes"])
                    w = rng.choice([f"*{v[1:]}", f"{v[:-1]}*",
                                    f"*{v[1:-1]}*" if len(v) > 2 else f"{v}*"])
                    clauses.append(f"{k}={w}")
                elif kind == 4:
                    clauses.append(
                        f"{k}{rng.choice(['>', '>=', '<', '<='])}"
                        f"{rng.choice(['3', '10', '42', '-2', '3.5'])}")
                elif kind == 5:
                    clauses.append(f"{k}{rng.choice(['~', '!~'])}"
                                   f"{rng.choice(['x.*', 's.c1a', 'y..'])}")
                else:
                    clauses.append(f"{k}={rng.choice(['3', '42', '-2', '3.5'])}")
            out.append("*" + "".join(f"[{c}]" for c in clauses))
        return out

    def test_random_queries_match_model(self, spark):
        import random

        from pyspark.sql import functions as F

        from libgeodesk_spark.functions.goql import (
            compile_goql, tags_resolver)
        rng = random.Random(20260817)
        rows = []
        for i in range(300):
            tags = {k: rng.choice(self.VALUES)
                    for k in self.KEYS if rng.random() < 0.6}
            rows.append((i, tags))
        queries = self._gen_queries(rng, 60)
        df = spark.createDataFrame(rows, "row_id long, tags map<string,string>")
        cols = [F.when(compile_goql(q, resolver=tags_resolver("tags")),
                       1).otherwise(0).alias(f"q{i}")
                for i, q in enumerate(queries)]
        got = {r["row_id"]: r for r in df.select("row_id", *cols).collect()}
        for i, (rid, tags) in enumerate(rows):
            r = got[rid]
            for qi, q in enumerate(queries):
                want = all(self._model_clause(tags, c)
                           for c in q[2:-1].split("]["))
                assert r[f"q{qi}"] == int(want), (q, tags)

    # -- full-grammar extension (VERDICT r3 'Next round' #7): typed
    #    multi-SELECTOR queries (`na[k][k2!=v],w[k3~"re"]`) vs the model

    TYPE_NAMES = {"n": "node", "w": "way", "a": "area", "r": "relation"}

    def _model_query(self, q, tags, ftype):
        """Independent model of a FULL query: comma-separated selectors
        OR; each selector = optional type letters (ANY letter admits the
        row's type; '*' admits all) AND its bracket clauses."""
        import re as _re
        ok_any = False
        for sel in _re.findall(r"(?:[^,\[]|\[[^\]]*\])+", q):
            m = _re.match(r"^([nwar*]*)", sel)
            letters = m.group(1)
            if letters and "*" not in letters:
                if ftype not in {self.TYPE_NAMES[c] for c in letters}:
                    continue
            clauses = _re.findall(r"\[([^\]]*)\]", sel)
            if all(self._model_clause(tags, c) for c in clauses):
                ok_any = True
        return ok_any

    def _gen_typed_queries(self, rng, n):
        out = []
        for _ in range(n):
            sels = []
            for _ in range(rng.randint(1, 3)):
                letters = rng.choice(
                    ["*", "n", "w", "a", "r", "na", "wa", "nwr", "nwar"])
                body = self._gen_queries(rng, 1)[0][1:]   # strip the '*'
                # 1-6 clauses per selector: sometimes append a second batch
                if rng.random() < 0.5:
                    body += self._gen_queries(rng, 1)[0][1:]
                sels.append(letters + body)
            out.append(",".join(sels))
        return out

    def test_random_typed_multiselector_queries_match_model(self, spark):
        """300 rows × 60 random FULL-grammar queries (typed selectors,
        OR of up to 3, up to 6 mixed clauses each) against the
        independent model — the multi-clause interaction surface the
        fixed oracle can't sweep."""
        import random

        from pyspark.sql import functions as F

        from libgeodesk_spark.functions.goql import (
            compile_goql, tags_resolver)
        rng = random.Random(42_2026)
        rows = []
        for i in range(300):
            tags = {k: rng.choice(self.VALUES)
                    for k in self.KEYS if rng.random() < 0.6}
            ftype = rng.choice(["node", "way", "area", "relation"])
            rows.append((i, tags, ftype))
        queries = self._gen_typed_queries(rng, 60)
        df = spark.createDataFrame(
            rows, "row_id long, tags map<string,string>, type string")
        cols = [F.when(compile_goql(q, resolver=tags_resolver("tags"),
                                    type_col="type"),
                       1).otherwise(0).alias(f"q{i}")
                for i, q in enumerate(queries)]
        got = {r["row_id"]: r for r in df.select("row_id", *cols).collect()}
        for rid, tags, ftype in rows:
            r = got[rid]
            for qi, q in enumerate(queries):
                want = self._model_query(q, tags, ftype)
                assert r[f"q{qi}"] == int(want), (q, tags, ftype)
