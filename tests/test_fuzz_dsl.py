"""Property-based fuzzing of the pure-Python schema front-end: arbitrary
junk must produce schema errors or parse — never crash. (No Spark here;
the compile-time path must be total.)"""

from hypothesis import given, settings, strategies as st

from peri_spark.dsl import validate_schema_errors, parse
from peri_spark.errors import summarize
from peri_spark.json_schema import to_json_schema

scalars = st.one_of(st.none(), st.booleans(), st.integers(), st.floats(),
                    st.text(max_size=10))
junk = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.tuples(children), st.tuples(children, children),
        st.tuples(children, children, children),
        st.lists(children, max_size=3),
        st.dictionaries(st.text(max_size=6), children, max_size=3)),
    max_leaves=12)


@given(junk)
@settings(max_examples=300, deadline=None)
def test_validate_schema_never_crashes(t):
    errs = validate_schema_errors({"field": t})
    assert isinstance(errs, list)
    for e in errs:
        assert isinstance(e.message, str)


valid_prims = st.sampled_from(
    ["string", "integer", "float", "boolean", "any", "date", "datetime"])
valid_dsl = st.recursive(
    st.one_of(
        valid_prims,
        st.tuples(st.just("required"), valid_prims),
        st.tuples(st.just("enum"), st.lists(st.text(min_size=1, max_size=5),
                                            min_size=1, max_size=4)),
        st.tuples(st.just("string"),
                  st.tuples(st.just("min"), st.integers(0, 100))),
        st.tuples(st.just("integer"),
                  st.tuples(st.just("gte"), st.integers(-100, 100)))),
    lambda children: st.one_of(
        st.tuples(st.just("list"), children),
        st.tuples(st.just("map"), children),
        st.tuples(st.just("either"), st.tuples(children, children)),
        st.dictionaries(st.text(min_size=1, max_size=6).map(
            lambda s: s.replace("`", "_")), children,
            min_size=1, max_size=3)),
    max_leaves=8)


@given(valid_dsl)
@settings(max_examples=200, deadline=None)
def test_valid_dsl_parses_summarizes_encodes(t):
    node = parse(t)
    assert isinstance(summarize(node), str)
    # JSON Schema encoder must be total over the valid DSL
    js = to_json_schema(t if isinstance(t, dict) else {"f": t})
    assert isinstance(js, dict)
