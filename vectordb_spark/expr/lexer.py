"""Tokenizer for the filter expression language.

Re-implements the reference state machine's observable behavior
(reference engine/query/expr/expr.cpp:90-293 `SplitTokens`):

- identifiers / keywords (AND OR NOT LIKE IN, TRUE/FALSE case-insensitive)
- int & double literals; unary minus binds to a following digit only when
  the previous token is an operator, '(' or start-of-expression
- single-quoted strings with ``\'`` escape
- operators ``+ - * / % < <= = >= > <>`` and parentheses
- ``@distance`` pseudo-attribute
- ``NEARBY(...)`` captured as one function token (paren-balanced)
- IN-lists: ``IN ('a', 'b')`` — string literals only
- error parity: bitwise ``& | ^`` and compound ops (``+=`` …) →
  NOT_IMPLEMENTED; malformed input → INVALID_EXPR

Documented superset: scientific notation (``1.5e-2``) tokenizes here;
the reference's const regex accepts it but its tokenizer rejects it
(expr.cpp:247-257), which we consider a reference bug.
"""

from __future__ import annotations

from vectordb_spark.schema import invalid_expr, not_implemented

_ARITH = set("+-*/%")
_COMPARE = set("<>=")
_KEYWORDS = {"AND", "OR", "NOT", "LIKE", "IN"}
_UNSUPPORTED = {"ALL", "ANY", "BETWEEN", "EXISTS", "SOME"}
_COMPARE_OPS = {">", ">=", "=", "<=", "<", "<>"}


def is_operator_token(tok: str) -> bool:
    return tok in _ARITH or tok in _COMPARE_OPS or tok in _KEYWORDS


def precedence(tok: str) -> int:
    # reference expr.cpp:75-88
    if tok in ("AND", "OR", "NOT"):
        return 1
    if tok in _COMPARE_OPS:
        return 2
    if tok in ("LIKE", "IN"):
        return 3
    if tok in ("+", "-"):
        return 4
    if tok in ("*", "/", "%"):
        return 5
    return 0


def tokenize(expression: str) -> list[str]:
    tokens: list[str] = []
    i, n = 0, len(expression)

    def prev_allows_unary_minus() -> bool:
        if not tokens:
            return True
        last = tokens[-1]
        return is_operator_token(last) or last == "("

    while i < n:
        c = expression[i]
        if c.isspace():
            i += 1
            continue
        if c in "()":
            tokens.append(c)
            i += 1
            continue
        if c in "&|^":
            raise not_implemented("Epsilla does not support bitwise operators yet.")
        if c == "@":
            if expression.startswith("@distance", i):
                tokens.append("@distance")
                i += 9
                continue
            raise invalid_expr("Filter expression is not valid.")
        if c == "'":
            i += 1
            buf = []
            closed = False
            while i < n:
                ch = expression[i]
                if ch == "\\" and i + 1 < n and expression[i + 1] == "'":
                    buf.append("'")
                    i += 2
                    continue
                if ch == "'":
                    i += 1
                    closed = True
                    break
                buf.append(ch)
                i += 1
            if not closed:
                raise invalid_expr("Missing terminating '.")
            tokens.append("'" + "".join(buf) + "'")
            continue
        if c.isdigit() or (
            c == "-" and i + 1 < n and expression[i + 1].isdigit() and prev_allows_unary_minus()
        ):
            i, tok = _lex_number(expression, i)
            tokens.append(tok)
            continue
        if c in _ARITH:
            if i + 1 < n and expression[i + 1] == "=":
                raise not_implemented("Epsilla does not support compound operators yet.")
            tokens.append(c)
            i += 1
            continue
        if c in _COMPARE:
            op = c
            if i + 1 < n and expression[i + 1] in _COMPARE:
                op += expression[i + 1]
            if op not in _COMPARE_OPS:
                raise invalid_expr(f"'{op}' is an invalid operator.")
            tokens.append(op)
            i += len(op)
            continue
        if c.isalpha() or c == "_":
            i, word = _lex_word(expression, i)
            upper = word.upper()
            if upper == "NEARBY" and i < n and expression[i] == "(":
                # capture the whole paren-balanced call as one token
                depth = 0
                j = i
                while j < n:
                    if expression[j] == "(":
                        depth += 1
                    elif expression[j] == ")":
                        depth -= 1
                        if depth == 0:
                            j += 1
                            break
                    j += 1
                if depth != 0:
                    raise invalid_expr("Filter expression is not valid.")
                tokens.append("NEARBY" + expression[i:j])
                i = j
                continue
            if upper in _KEYWORDS or upper in _UNSUPPORTED or upper in ("TRUE", "FALSE"):
                tokens.append(upper)
                if upper == "IN":
                    i = _lex_in_list(expression, i, tokens)
                continue
            tokens.append(word)
            continue
        raise invalid_expr("Filter expression is not valid.")
    return tokens


def _lex_number(s: str, i: int) -> tuple[int, str]:
    n = len(s)
    start = i
    if s[i] == "-":
        i += 1
    dots = 0
    while i < n:
        c = s[i]
        if c.isdigit():
            i += 1
        elif c == "." and i + 1 < n and s[i + 1].isdigit():
            dots += 1
            if dots > 1:
                raise invalid_expr(s[start:i + 1] + " is not a valid number.")
            i += 1
        elif c in "eE" and dots >= 0 and i + 1 < n and (
            s[i + 1].isdigit()
            or (s[i + 1] in "+-" and i + 2 < n and s[i + 2].isdigit())
        ):
            # scientific notation (superset; see module docstring)
            i += 2 if s[i + 1] in "+-" else 1
            while i < n and s[i].isdigit():
                i += 1
            break
        else:
            break
    return i, s[start:i]


def _lex_word(s: str, i: int) -> tuple[int, str]:
    n = len(s)
    start = i
    while i < n and (s[i].isalnum() or s[i] == "_"):
        i += 1
    return i, s[start:i]


def _lex_in_list(s: str, i: int, tokens: list[str]) -> int:
    """After an IN keyword: only '(', string literals, ',', ')' allowed
    (reference InList state, expr.cpp:221-238)."""
    n = len(s)
    while i < n:
        c = s[i]
        if c.isspace() or c == ",":
            i += 1
        elif c == "(":
            tokens.append("(")
            i += 1
        elif c == ")":
            tokens.append(")")
            return i + 1
        elif c == "'":
            i += 1
            buf = []
            closed = False
            while i < n:
                ch = s[i]
                if ch == "\\" and i + 1 < n and s[i + 1] == "'":
                    buf.append("'")
                    i += 2
                    continue
                if ch == "'":
                    i += 1
                    closed = True
                    break
                buf.append(ch)
                i += 1
            if not closed:
                raise invalid_expr("Missing terminating '.")
            tokens.append("'" + "".join(buf) + "'")
        else:
            raise invalid_expr("Filter expression is not valid.")
    raise invalid_expr("Filter expression is not valid.")
