"""EBNF/GBNF grammar -> regex compiler.

Counterpart of the reference's EBNF grammar support (xgrammar accepts
GBNF-style EBNF, `constrained/xgrammar_backend.py dispatch_ebnf`).  The
engine here is a byte-level regular-expression FSM
(`constrained/regex_engine.py`), so the grammar is compiled by *inline
expansion* into one regex:

  * ``name ::= alternatives`` rules; ``root`` is the entry point
  * literals ``"..."`` (with \\n \\t \\r \\\\ \\" \\xNN escapes)
  * char classes ``[a-z0-9_-]`` / ``[^...]`` (passed through)
  * grouping ``( )``, alternation ``|``
  * postfix ``*`` ``+`` ``?`` ``{m}`` ``{m,}`` ``{m,n}``
  * rule references by identifier; ``#`` comments

Recursion is regular-ized by bounded expansion: a self/mutually recursive
reference expands up to ``max_depth`` levels, below which recursive
alternatives are dropped (the base-case alternatives must exist).  This
accepts the usual bounded-nesting fragment of a CFG — the same compromise
`json_schema.build_json_regex` makes for nested schemas.  Unboundedly
recursive grammars with no base case are rejected loudly.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Tuple

_META = set("()[].\\*+?{}|")


def _escape_literal(text: str) -> str:
    return "".join("\\" + c if c in _META else c for c in text)


# ----------------------------------------------------------------------
# AST
# ----------------------------------------------------------------------
@dataclasses.dataclass
class Lit:
    text: str


@dataclasses.dataclass
class Cls:
    raw: str  # includes the [ ... ]


@dataclasses.dataclass
class Ref:
    name: str


@dataclasses.dataclass
class Seq:
    items: list


@dataclasses.dataclass
class Alt:
    options: List[Seq]


@dataclasses.dataclass
class Rep:
    item: object
    op: str  # "*", "+", "?", or "{m,n}" raw


class _Tok:
    def __init__(self, src: str):
        self.src = src
        self.i = 0

    def _skip_ws(self):
        while self.i < len(self.src):
            c = self.src[self.i]
            if c == "#":  # comment to end of line
                while self.i < len(self.src) and self.src[self.i] != "\n":
                    self.i += 1
            elif c in " \t\r\n":
                self.i += 1
            else:
                break

    def peek(self) -> Optional[str]:
        self._skip_ws()
        return self.src[self.i] if self.i < len(self.src) else None

    def startswith(self, s: str) -> bool:
        self._skip_ws()
        return self.src.startswith(s, self.i)


_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_\-]*")

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "/": "/"}


class EbnfParser:
    """Parses GBNF-ish EBNF text into {rule_name: Alt}."""

    def __init__(self, src: str):
        self.t = _Tok(src)

    def parse(self) -> Dict[str, Alt]:
        rules: Dict[str, Alt] = {}
        while self.t.peek() is not None:
            name = self._ident()
            self._expect("::=")
            rules[name] = self._alternatives()
        if not rules:
            raise ValueError("empty EBNF grammar")
        return rules

    # ------------------------------------------------------------------
    def _ident(self) -> str:
        self.t._skip_ws()
        m = _IDENT.match(self.t.src, self.t.i)
        if not m:
            raise ValueError(
                f"expected identifier at ...{self.t.src[self.t.i:self.t.i+20]!r}"
            )
        self.t.i = m.end()
        return m.group(0)

    def _expect(self, s: str):
        self.t._skip_ws()
        if not self.t.src.startswith(s, self.t.i):
            raise ValueError(
                f"expected {s!r} at ...{self.t.src[self.t.i:self.t.i+20]!r}"
            )
        self.t.i += len(s)

    def _alternatives(self) -> Alt:
        options = [self._sequence()]
        while self.t.peek() == "|":
            self.t.i += 1
            options.append(self._sequence())
        return Alt(options)

    def _at_rule_boundary(self) -> bool:
        """A bare identifier followed by ::= starts the next rule."""
        save = self.t.i
        self.t._skip_ws()
        m = _IDENT.match(self.t.src, self.t.i)
        if m:
            j = m.end()
            while j < len(self.t.src) and self.t.src[j] in " \t":
                j += 1
            if self.t.src.startswith("::=", j):
                self.t.i = save
                return True
        self.t.i = save
        return False

    def _sequence(self) -> Seq:
        items = []
        while True:
            c = self.t.peek()
            if c is None or c in ")|":
                break
            if self._at_rule_boundary():
                break
            items.append(self._repeat())
        return Seq(items)

    def _repeat(self):
        item = self._atom()
        while True:
            self.t._skip_ws()
            c = self.t.src[self.t.i] if self.t.i < len(self.t.src) else None
            if c in ("*", "+", "?"):
                self.t.i += 1
                item = Rep(item, c)
            elif c == "{":
                j = self.t.src.index("}", self.t.i)
                item = Rep(item, self.t.src[self.t.i : j + 1])
                self.t.i = j + 1
            else:
                return item

    def _atom(self):
        c = self.t.peek()
        if c == "(":
            self.t.i += 1
            inner = self._alternatives()
            self._expect(")")
            return inner
        if c == '"':
            return self._string()
        if c == "[":
            return self._char_class()
        return Ref(self._ident())

    def _string(self) -> Lit:
        s = self.t.src
        i = self.t.i + 1
        out = []
        while i < len(s) and s[i] != '"':
            if s[i] == "\\":
                i += 1
                e = s[i]
                if e == "x":
                    out.append(chr(int(s[i + 1 : i + 3], 16)))
                    i += 3
                    continue
                if e == "u":
                    out.append(chr(int(s[i + 1 : i + 5], 16)))
                    i += 5
                    continue
                out.append(_ESCAPES.get(e, e))
                i += 1
            else:
                out.append(s[i])
                i += 1
        if i >= len(s):
            raise ValueError("unterminated string literal")
        self.t.i = i + 1
        return Lit("".join(out))

    def _char_class(self) -> Cls:
        s = self.t.src
        i = self.t.i + 1
        while i < len(s):
            if s[i] == "\\":
                i += 2
                continue
            if s[i] == "]":
                break
            i += 1
        if i >= len(s):
            raise ValueError("unterminated char class")
        raw = s[self.t.i : i + 1]
        self.t.i = i + 1
        return Cls(raw)


# ----------------------------------------------------------------------
# bounded expansion to a regex
# ----------------------------------------------------------------------
class _Budget:
    def __init__(self, max_chars: int):
        self.left = max_chars

    def spend(self, n: int):
        self.left -= n
        if self.left < 0:
            raise ValueError(
                "EBNF grammar too large after bounded expansion "
                "(deep recursion? raise max_depth only with care)"
            )


class _Recursed(Exception):
    pass


def _emit(node, rules, stack: Tuple[str, ...], depth: Dict[str, int],
          max_depth: int, budget: _Budget) -> str:
    if isinstance(node, Lit):
        s = _escape_literal(node.text)
        budget.spend(len(s))
        return s
    if isinstance(node, Cls):
        budget.spend(len(node.raw))
        return node.raw
    if isinstance(node, Seq):
        return "".join(
            _emit(it, rules, stack, depth, max_depth, budget)
            for it in node.items
        )
    if isinstance(node, Alt):
        parts = []
        for opt in node.options:
            try:
                parts.append(
                    _emit(opt, rules, stack, depth, max_depth, budget)
                )
            except _Recursed:
                continue  # drop recursive alternatives past the depth cap
        if not parts:
            raise _Recursed()
        if len(parts) == 1:
            return parts[0]
        budget.spend(sum(len(p) for p in parts) + 3 * len(parts))
        return "(?:" + "|".join(parts) + ")"
    if isinstance(node, Rep):
        inner = _emit(node.item, rules, stack, depth, max_depth, budget)
        budget.spend(len(inner) + 8)
        return f"(?:{inner}){node.op}"
    if isinstance(node, Ref):
        if node.name not in rules:
            raise ValueError(f"undefined rule {node.name!r}")
        d = depth.get(node.name, 0)
        if d >= max_depth:
            raise _Recursed()
        depth[node.name] = d + 1
        try:
            return _emit(
                rules[node.name], rules, stack + (node.name,), depth,
                max_depth, budget,
            )
        finally:
            depth[node.name] = d
    raise TypeError(node)


def ebnf_to_regex(
    grammar: str,
    root: str = "root",
    max_depth: int = 4,
    max_chars: int = 400_000,
) -> str:
    """Compile an EBNF grammar to a regex for the byte-level FSM."""
    rules = EbnfParser(grammar).parse()
    if root not in rules:
        root = next(iter(rules))
    budget = _Budget(max_chars)
    try:
        return _emit(rules[root], rules, (root,), {root: 1}, max_depth, budget)
    except _Recursed:
        raise ValueError(
            f"rule {root!r} is unboundedly recursive (no base case within "
            f"depth {max_depth})"
        )
