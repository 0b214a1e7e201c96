"""Lucene query-string language → AST.

The reference's saved searches and dashboard filters carry Lucene
query-language strings (/root/reference/consumer/app/visualization.py:46-53,
``searchSourceJSON.query``: e.g. ``field:value AND "a phrase" -neg wild*``).
This parser maps that language onto the engine's existing primitives so a
reference dashboard's query replays without hand-translation.

Supported surface (the subset those saved searches use):

- bare terms (analyzed; default operator OR)
- ``"quoted phrases"``, with slop: ``"a b"~2`` (in-order window; see
  ``operators.topk.IndexReader.phrase_docs`` for the exact semantics)
- ``field:clause`` (this engine indexes ONE analyzed text field; accepted
  field names are configurable and default to ``text``/``_all``/``*`` —
  anything else raises, loudly, instead of silently matching nothing)
- ``AND`` / ``OR`` / ``&&`` / ``||`` / ``NOT`` with parentheses; OR binds
  loosest, AND tighter, NOT is unary
- ``+must`` / ``-must_not`` clause modifiers (Lucene semantics: when a
  level has any ``+``/AND clause, plain clauses stop being required)
- wildcards ``wi*d`` / ``w?ld``, prefix ``wind*``, fuzzy ``term~`` /
  ``term~1``
- boosts ``term^2`` / ``"a phrase"^1.5`` / ``wind*^3`` (and Lucene's
  suffix order ``term~1^2``, ``"a b"~2^3``) — score multipliers in
  SCORED context (``query_string_search``); ignored in filter context,
  exactly like ES
- ``\\`` escapes the next character inside a bare term

Deliberately out of scope (raise ValueError): range queries, regex
``/…/`` — neither appears in the reference's artifacts.

The AST is executed in FILTER context (doc-id sets) by
``operators.topk.IndexReader.query_string_docs`` — set algebra stays in
Catalyst (semi/anti joins over the pruned posting reads), so a parsed
query scales exactly like its hand-written ``bool_docs`` equivalent.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Term:
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase:
    text: str
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class Prefix:
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard:
    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy:
    term: str
    max_edits: int = 2
    boost: float = 1.0


@dataclass(frozen=True)
class Bool:
    must: tuple = field(default_factory=tuple)
    should: tuple = field(default_factory=tuple)
    must_not: tuple = field(default_factory=tuple)


Node = Term | Phrase | Prefix | Wildcard | Fuzzy | Bool

_TOKEN_RE = re.compile(
    r"""
    \s*(
        "(?:[^"\\]|\\.)*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?
                                   # quoted phrase, optional slop + boost
      | \(|\)
      | &&|\|\|
      | [+\-]
      | (?:[^\s()+\-"][^\s()"]*)   # bare term / field:term / AND / OR / NOT
    )
    """,
    re.VERBOSE,
)

DEFAULT_FIELDS = ("text", "_all", "*")


def _lex(q: str) -> list[str]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            if q[i:].strip():
                raise ValueError(f"cannot lex query at: {q[i:]!r}")
            break
        out.append(m.group(1))
        i = m.end()
    return out


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


class _Parser:
    def __init__(self, tokens: list[str], fields: tuple[str, ...]):
        self.toks = tokens
        self.i = 0
        self.fields = fields

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    # or_expr := and_expr ((OR | implicit) and_expr)*
    def parse_or(self) -> Node:
        must: list[Node] = []
        should: list[Node] = []
        must_not: list[Node] = []

        def add(mod: str | None, node: Node) -> None:
            if mod == "+":
                must.append(node)
            elif mod == "-":
                must_not.append(node)
            else:
                should.append(node)

        mod, node = self.parse_and()
        add(mod, node)
        while True:
            t = self.peek()
            if t is None or t == ")":
                break
            if t in ("OR", "||"):
                self.next()
            mod, node = self.parse_and()
            add(mod, node)
        if len(must) + len(should) + len(must_not) == 1 and should:
            return should[0]
        if len(must) == 1 and not should and not must_not:
            return must[0]  # Bool(must=(X,)) ≡ X
        if not must and not should:
            raise ValueError(
                "purely negative query (only -/NOT clauses) matches "
                "nothing in filter context"
            )
        return Bool(tuple(must), tuple(should), tuple(must_not))

    # and_expr := unary (AND unary)* ; returns (modifier, node) where the
    # modifier is the leading +/- of a single-clause group
    def parse_and(self) -> tuple[str | None, Node]:
        mod, node = self.parse_unary()
        must: list[Node] = []
        must_not: list[Node] = []
        if mod == "-":
            must_not.append(node)
        else:
            must.append(node)
        first_mod = mod
        n = 1
        while self.peek() in ("AND", "&&"):
            self.next()
            n += 1
            mod2, node2 = self.parse_unary()
            if mod2 == "-":
                must_not.append(node2)
            else:
                must.append(node2)
        if n == 1:
            return first_mod, node
        if not must:
            raise ValueError("AND group with only negative clauses")
        return "+", Bool(tuple(must), (), tuple(must_not))

    def parse_unary(self) -> tuple[str | None, Node]:
        t = self.peek()
        if t in ("+", "-"):
            self.next()
            _, node = self.parse_unary()
            return t, node
        if t == "NOT":
            self.next()
            _, node = self.parse_unary()
            return "-", node
        return None, self.parse_atom()

    def parse_atom(self) -> Node:
        t = self.next()
        if t == "(":
            node = self.parse_or()
            if self.peek() != ")":
                raise ValueError("unbalanced parenthesis")
            self.next()
            return node
        if t == ")":
            raise ValueError("unexpected ')'")
        # field: prefix (only on unquoted atoms, Lucene-style)
        if not t.startswith('"'):
            m = re.match(r"^([A-Za-z_*][\w.*]*):(.*)$", t)
            if m:
                fld, rest = m.group(1), m.group(2)
                if fld not in self.fields:
                    raise ValueError(
                        f"unknown field {fld!r}: this index has a single "
                        f"analyzed text field (accepted: {self.fields})"
                    )
                if rest.startswith('"'):
                    t = rest
                elif rest == "(":
                    raise ValueError("field:(…) grouping is not supported")
                elif not rest:
                    # the lexer splits `field:"a phrase"` into two tokens
                    nxt = self.peek()
                    if nxt is not None and nxt.startswith('"'):
                        t = self.next()
                    else:
                        raise ValueError(f"dangling field prefix {fld!r}:")
                else:
                    t = rest
        if t.startswith('"'):
            boost = 1.0
            m = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", t, re.DOTALL)
            if m:
                t, boost = m.group(1), float(m.group(2))
            slop = 0
            m = re.match(r'^(".*")~(\d+)$', t, re.DOTALL)
            if m:
                t, slop = m.group(1), int(m.group(2))
            if not (len(t) >= 2 and t.endswith('"')):
                raise ValueError(f"unterminated phrase {t!r}")
            body = _unescape(t[1:-1])
            return Phrase(body, slop, boost)
        # boost suffix (rightmost, Lucene order: term~edits^boost)
        boost = 1.0
        m = re.match(r"^(.+)\^(\d+(?:\.\d+)?)$", t)
        if m and not m.group(1).endswith("\\"):
            t, boost = m.group(1), float(m.group(2))
        for bad, what in (("^", "boost position"), ("/", "regex"),
                          ("[", "range"), ("{", "range")):
            if bad in t:
                raise ValueError(f"{what} syntax ({bad!r}) is not supported")
        m = re.match(r"^(.*?)~(\d*)$", t)
        if m and not t.endswith("\\~"):
            base = _unescape(m.group(1))
            if not base:
                raise ValueError(f"dangling fuzzy operator in {t!r}")
            edits = int(m.group(2)) if m.group(2) else 2
            if edits > 2:
                raise ValueError("fuzzy edit distance is capped at 2")
            return Fuzzy(base, edits, boost)
        has_wild = re.search(r"(?<!\\)[*?]", t) is not None
        if has_wild:
            # trailing-* with no other wildcard char = prefix query (the
            # term-dictionary expansion is cheaper than a LIKE scan)
            if t.endswith("*") and not re.search(r"(?<!\\)[*?]", t[:-1]):
                return Prefix(_unescape(t[:-1]), boost)
            return Wildcard(_unescape(t), boost)
        return Term(_unescape(t), boost)


def parse_query_string(
    q: str, fields: tuple[str, ...] = DEFAULT_FIELDS
) -> Node:
    """Parse a Lucene query string → AST. Raises ValueError with a precise
    message on unsupported syntax (never silently drops a clause)."""
    toks = _lex(q)
    if not toks:
        raise ValueError("empty query string")
    p = _Parser(toks, fields)
    node = p.parse_or()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens: {p.toks[p.i:]}")
    return node
