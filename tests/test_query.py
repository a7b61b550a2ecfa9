"""Query language tests: token golden tables (query/lexer_test.go analog),
AST-shape strings (query/parser_test.go analog), and end-to-end filter
evaluation over JSON documents (query/compiler_test.go analog)."""

import pytest

from syzgydb_tpu.query import (Lexer, T, QueryError, filter_function_from_query,
                               parse_query)


def toks(text):
    return [(t.type, t.literal) for t in Lexer(text).tokens()[:-1]]


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

def test_lexer_operators():
    assert toks("a == 1 AND b != 2 OR c >= 3") == [
        (T.IDENT, "a"), (T.EQ, "=="), (T.NUMBER, "1"), (T.AND, "AND"),
        (T.IDENT, "b"), (T.NEQ, "!="), (T.NUMBER, "2"), (T.OR, "OR"),
        (T.IDENT, "c"), (T.GTE, ">="), (T.NUMBER, "3")]


def test_lexer_two_word_keyword():
    """`DOES NOT EXIST` lexes as one token (lexer.go:173-189)."""
    assert toks("field DOES NOT EXIST") == [
        (T.IDENT, "field"), (T.DOES_NOT_EXIST, "DOES NOT EXIST")]
    # DOES followed by something else stays an identifier
    assert toks("DOES stuff") == [(T.IDENT, "DOES"), (T.IDENT, "stuff")]
    assert toks("DOES NOT x") == [
        (T.IDENT, "DOES"), (T.NOT, "NOT"), (T.IDENT, "x")]


def test_lexer_numbers():
    assert toks("1 2.5 0x1F 1e3 2.5e-2") == [
        (T.NUMBER, "1"), (T.NUMBER, "2.5"), (T.NUMBER, "0x1F"),
        (T.NUMBER, "1e3"), (T.NUMBER, "2.5e-2")]


def test_lexer_strings_and_escapes():
    assert toks("'abc' \"d\\ne\"") == [(T.STRING, "abc"), (T.STRING, "d\ne")]
    assert toks(r"'a\tb'") == [(T.STRING, "a\tb")]
    assert toks(r"'a\qb'") == [(T.STRING, r"a\qb")]  # unknown escape kept


def test_lexer_array_star_and_brackets():
    assert toks("items[*] x[0]") == [
        (T.IDENT, "items"), (T.ARRAY_STAR, "[*]"), (T.IDENT, "x"),
        (T.LBRACKET, "["), (T.NUMBER, "0"), (T.RBRACKET, "]")]


def test_lexer_keywords():
    assert toks("IN EXISTS CONTAINS STARTS_WITH ENDS_WITH MATCHES "
                "true false null") == [
        (T.IN, "IN"), (T.EXISTS, "EXISTS"), (T.CONTAINS, "CONTAINS"),
        (T.STARTS_WITH, "STARTS_WITH"), (T.ENDS_WITH, "ENDS_WITH"),
        (T.MATCHES, "MATCHES"), (T.BOOLEAN, "true"), (T.BOOLEAN, "false"),
        (T.NULL, "null")]


# ---------------------------------------------------------------------------
# Parser — AST golden strings (parser_test.go style)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("query,want", [
    ("age == 30", "==(age, 30)"),
    ("a > 1 AND b < 2", "AND(>(a, 1), <(b, 2))"),
    ("a == 1 OR b == 2 AND c == 3", "OR(==(a, 1), AND(==(b, 2), ==(c, 3)))"),
    ("NOT active", "NOT(active)"),
    ("user.email ENDS_WITH '@x.com'", "ENDS_WITH(.(user, email), '@x.com')"),
    ("status IN ['a', 'b']", "IN(status, ['a', 'b'])"),
    ("status NOT IN ['a']", "NOT_IN(status, ['a'])"),
    ("items[0].name == 'x'", "==(.([](items, 0), name), 'x')"),
    ("field EXISTS", "EXISTS(field)"),
    ("field DOES NOT EXIST", "DOES_NOT_EXIST(field)"),
    ("(a == 1)", "==(a, 1)"),
    ("x MATCHES '^a+$'", "MATCHES(x, '^a+$')"),
    ("tags.length > 3", ">(.(tags, length), 3)"),
    ("price >= :min", ">=(price, :min)"),
])
def test_parser_ast_shapes(query, want):
    assert str(parse_query(query)) == want


def test_parser_errors():
    for bad in ["== 3", "a IN 3", "a IN [", "(a == 1", "a.", "a == ", ""]:
        with pytest.raises(QueryError):
            parse_query(bad)


# ---------------------------------------------------------------------------
# End-to-end filters (compiler_test.go table)
# ---------------------------------------------------------------------------

CASES = [
    ("age == 30", b'{"age": 30}', True),
    ("age != 25", b'{"age": 30}', True),
    ("age > 25", b'{"age": 30}', True),
    ("age <= 30", b'{"age": 30}', True),
    ("age < 25", b'{"age": 30}', False),
    ("(age >= 18 AND status == 'active') OR role == 'admin'",
     b'{"age": 25, "status": "active", "role": "user"}', True),
    ("user.email ENDS_WITH '@example.com'",
     b'{"user": {"email": "john@example.com"}}', True),
    ("status IN ['active', 'pending']", b'{"status": "pending"}', True),
    ("status NOT IN ['inactive', 'suspended']", b'{"status": "active"}', True),
    ("(user.age > 25 AND (user.status == 'active' OR user.role == 'admin'))"
     " AND company.name STARTS_WITH 'Tech'",
     b'{"user": {"age": 30, "status": "inactive", "role": "admin"},'
     b' "company": {"name": "TechCorp"}}', True),
    ("name CONTAINS 'John' AND email ENDS_WITH '@example.com' AND "
     "id STARTS_WITH 'USER'",
     b'{"name": "John Doe", "email": "johndoe@example.com", "id": "USER123"}',
     True),
    ("price > 100 AND price < 200 AND quantity >= 5 AND discount <= 0.2",
     b'{"price": 150, "quantity": 10, "discount": 0.15}', True),
    ("is_active == true AND is_deleted == false",
     b'{"is_active": true, "is_deleted": false}', True),
    # uppercase NULL resolves as a missing identifier -> None (reference
    # accident-compatible, see compiler_test.go "NULL checks")
    ("optional_field == NULL AND required_field != NULL",
     b'{"required_field": "value"}', True),
    ("optional_field == null", b'{"required_field": 1}', True),
    ("username MATCHES '^[a-z0-9_]{3,16}$'",
     b'{"username": "john_doe123"}', True),
    ("username MATCHES '^[a-z]+$'", b'{"username": "john123"}', False),
    ("users[0].contacts[1].address.city == 'New York'",
     b'{"users": [{"contacts": [{"address": {"city": "LA"}}, '
     b'{"address": {"city": "New York"}}]}]}', True),
    ("tags.length > 3 AND optional_field EXISTS",
     b'{"tags": ["r", "g", "b", "y"], "optional_field": "value"}', True),
    ("((a > 10 OR b < 5) AND (c == true OR d != false)) OR "
     "(e IN [1, 2, 3] AND f NOT IN ['x', 'y', 'z'])",
     b'{"a": 15, "b": 7, "c": false, "d": true, "e": 2, "f": "w"}', True),
    ("missing DOES NOT EXIST", b'{"other": 1}', True),
    ("other DOES NOT EXIST", b'{"other": 1}', False),
    ("arr[5] == null", b'{"arr": [1, 2]}', True),  # OOB index -> nil
    ("n == 0x1F", b'{"n": 31}', True),
    ("n == 1e3", b'{"n": 1000}', True),
    ("NOT (a == 1)", b'{"a": 2}', True),
    # extension: ANY/ALL (reference defines semantics but not grammar)
    ("ANY(items[*], quantity > 100)",
     b'{"items": [{"quantity": 50}, {"quantity": 150}]}', True),
    ("ALL(items[*], quantity > 100)",
     b'{"items": [{"quantity": 150}, {"quantity": 120}]}', True),
    ("ALL(items[*], quantity > 100)",
     b'{"items": [{"quantity": 50}, {"quantity": 120}]}', False),
    # extension: LENGTH() callable from query strings
    ("LENGTH(tags) >= 3", b'{"tags": ["a", "b", "c"]}', True),
    ("LENGTH(name) == 4", b'{"name": "john"}', True),
]


@pytest.mark.parametrize("query,data,want", CASES)
def test_filter_end_to_end(query, data, want):
    fn = filter_function_from_query(query)
    assert fn(data) is want


def test_filter_error_paths():
    fn = filter_function_from_query("user.name == 'x'")
    # missing nested key -> error (compiler.go:225-233)
    with pytest.raises(Exception):
        fn(b'{"user": {}}')
    # non-map left of '.' -> error
    with pytest.raises(Exception):
        fn(b'{"user": 5}')
    # invalid JSON -> error
    with pytest.raises(Exception):
        fn(b'not json')
    # non-boolean result -> error
    fn2 = filter_function_from_query("age")
    with pytest.raises(Exception):
        fn2(b'{"age": 30}')


def test_string_vs_number_comparison_errors():
    fn = filter_function_from_query("age > 'abc'")
    with pytest.raises(Exception):
        fn(b'{"age": 30}')


def test_equality_mixed_types_false_not_error():
    fn = filter_function_from_query("age == 'abc'")
    assert fn(b'{"age": 30}') is False
    fn = filter_function_from_query("flag == 1")
    # bool vs number: not equal (Go DeepEqual type mismatch)
    assert fn(b'{"flag": true}') is False


def test_build_filter_integration():
    """syzgydb.BuildFilter analog: errors reject the record, not the query."""
    from syzgydb_tpu import build_filter
    filt = build_filter("user.name == 'x'")
    assert filt(1, b'{"user": {"name": "x"}}') is True
    assert filt(2, b'{"user": {}}') is False  # eval error -> rejected
    assert filt(3, b'bad json') is False
