"""Byte-level regex engine: parser -> Thompson NFA -> lazy subset DFA.

From-scratch replacement for the reference's grammar backends
(`constrained/xgrammar_backend.py`, `outlines_backend.py` + interegular):
this image ships neither, so the FSM core is built here.  Operates on UTF-8
bytes so token masking works for any tokenizer.

Supported syntax (the practical subset used by JSON-schema guidance and the
reference's regex sampling params): literals, `.`, escapes (\\d \\w \\s \\n
\\t \\r \\\\ \\" etc), char classes `[a-z0-9_]` (negation `[^...]`),
groups `(...)`, alternation `|`, quantifiers `* + ? {m} {m,} {m,n}`.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Set, Tuple

EPS = -1  # epsilon edge label


class _NFA:
    """Thompson construction: states are ints; edges `byte -> {states}`."""

    def __init__(self):
        self.transitions: List[Dict[int, Set[int]]] = []

    def new_state(self) -> int:
        self.transitions.append({})
        return len(self.transitions) - 1

    def add_edge(self, s: int, label: int, t: int):
        self.transitions[s].setdefault(label, set()).add(t)


class RegexParser:
    """Recursive-descent regex -> (NFA, start, accept)."""

    def __init__(self, pattern: str):
        self.pat = pattern
        self.i = 0
        self.nfa = _NFA()

    def parse(self) -> Tuple[_NFA, int, int]:
        start, accept = self._alternation()
        if self.i != len(self.pat):
            raise ValueError(f"unexpected '{self.pat[self.i]}' at {self.i}")
        return self.nfa, start, accept

    # each production returns (start, accept) fragment
    def _alternation(self):
        frags = [self._concat()]
        while self._peek() == "|":
            self.i += 1
            frags.append(self._concat())
        if len(frags) == 1:
            return frags[0]
        s, a = self.nfa.new_state(), self.nfa.new_state()
        for fs, fa in frags:
            self.nfa.add_edge(s, EPS, fs)
            self.nfa.add_edge(fa, EPS, a)
        return s, a

    def _concat(self):
        frags = []
        while self._peek() not in (None, "|", ")"):
            frags.append(self._repeat())
        if not frags:
            s = self.nfa.new_state()
            return s, s
        s, a = frags[0]
        for fs, fa in frags[1:]:
            self.nfa.add_edge(a, EPS, fs)
            a = fa
        return s, a

    def _repeat(self):
        frag = self._atom()
        while True:
            c = self._peek()
            if c == "*":
                self.i += 1
                frag = self._star(frag)
            elif c == "+":
                self.i += 1
                s1, a1 = frag
                s2, a2 = self._copy_frag(frag)
                frag2 = self._star((s2, a2))
                self.nfa.add_edge(a1, EPS, frag2[0])
                frag = (s1, frag2[1])
            elif c == "?":
                self.i += 1
                s, a = frag
                self.nfa.add_edge(s, EPS, a)
                frag = (s, a)
            elif c == "{":
                frag = self._bounded(frag)
            else:
                return frag

    def _star(self, frag):
        s, a = self.nfa.new_state(), self.nfa.new_state()
        fs, fa = frag
        self.nfa.add_edge(s, EPS, fs)
        self.nfa.add_edge(s, EPS, a)
        self.nfa.add_edge(fa, EPS, fs)
        self.nfa.add_edge(fa, EPS, a)
        return s, a

    def _bounded(self, frag):
        j = self.pat.index("}", self.i)
        spec = self.pat[self.i + 1 : j]
        self.i = j + 1
        if "," in spec:
            lo_s, hi_s = spec.split(",", 1)
            lo = int(lo_s) if lo_s else 0
            hi = int(hi_s) if hi_s else None
        else:
            lo = hi = int(spec)
        # expand by copying the fragment
        frags = [frag] + [self._copy_frag(frag) for _ in range(max(lo, 1) - 1)]
        if hi is None:
            tail: Optional[Tuple[int, int]] = self._star(self._copy_frag(frag))
        else:
            tail = None
            opts = []
            for _ in range(hi - lo):
                f = self._copy_frag(frag)
                self.nfa.add_edge(f[0], EPS, f[1])  # optional
                opts.append(f)
            frags.extend(opts)
        if lo == 0:
            self.nfa.add_edge(frags[0][0], EPS, frags[0][1])
        s, a = frags[0]
        for fs, fa in frags[1:]:
            self.nfa.add_edge(a, EPS, fs)
            a = fa
        if tail is not None:
            self.nfa.add_edge(a, EPS, tail[0])
            a = tail[1]
        return s, a

    def _copy_frag(self, frag):
        """Deep-copy a fragment's subgraph (for {m,n} expansion)."""
        s0, a0 = frag
        reach = set()
        stack = [s0]
        while stack:
            x = stack.pop()
            if x in reach:
                continue
            reach.add(x)
            for tgts in self.nfa.transitions[x].values():
                stack.extend(tgts)
        mapping = {x: self.nfa.new_state() for x in reach}
        for x in reach:
            for label, tgts in list(self.nfa.transitions[x].items()):
                for t in tgts:
                    if t in mapping:
                        self.nfa.add_edge(mapping[x], label, mapping[t])
        return mapping[s0], mapping.get(a0, mapping[s0])

    # ------------------------------------------------------------------
    def _atom(self):
        c = self._peek()
        if c == "(":
            self.i += 1
            if self.pat[self.i : self.i + 2] == "?:":
                self.i += 2
            frag = self._alternation()
            if self._peek() != ")":
                raise ValueError("unbalanced parens")
            self.i += 1
            return frag
        if c == "[":
            return self._char_class()
        if c == ".":
            self.i += 1
            return self._byte_set({b for b in range(256) if b != 0x0A})
        if c == "\\":
            self.i += 1
            return self._escape()
        if c in ("*", "+", "?", "{", "}", ")"):
            raise ValueError(f"unexpected '{c}' at {self.i}")
        self.i += 1
        return self._literal(c)

    def _literal(self, ch: str):
        bs = ch.encode("utf-8")
        s = self.nfa.new_state()
        cur = s
        for b in bs:
            nxt = self.nfa.new_state()
            self.nfa.add_edge(cur, b, nxt)
            cur = nxt
        return s, cur

    def _byte_set(self, byte_values: Set[int]):
        s, a = self.nfa.new_state(), self.nfa.new_state()
        for b in byte_values:
            self.nfa.add_edge(s, b, a)
        return s, a

    ESCAPE_CLASSES = {
        "d": set(range(0x30, 0x3A)),
        "w": set(range(0x30, 0x3A)) | set(range(0x41, 0x5B)) | set(range(0x61, 0x7B)) | {0x5F},
        "s": {0x20, 0x09, 0x0A, 0x0D, 0x0C, 0x0B},
        "n": {0x0A},
        "t": {0x09},
        "r": {0x0D},
    }

    def _escape(self):
        c = self.pat[self.i]
        self.i += 1
        if c in self.ESCAPE_CLASSES:
            return self._byte_set(self.ESCAPE_CLASSES[c])
        if c in ("D", "W", "S"):
            pos = self.ESCAPE_CLASSES[c.lower()]
            return self._byte_set(set(range(256)) - pos)
        if c == "x":
            hx = self.pat[self.i : self.i + 2]
            self.i += 2
            return self._byte_set({int(hx, 16)})
        return self._literal(c)

    def _char_class(self):
        assert self.pat[self.i] == "["
        self.i += 1
        negate = False
        if self._peek() == "^":
            negate = True
            self.i += 1
        byte_values: Set[int] = set()
        multi: List[Tuple[int, int]] = []  # multi-byte literal frags
        first = True
        while True:
            c = self._peek()
            if c is None:
                raise ValueError("unterminated char class")
            if c == "]" and not first:
                self.i += 1
                break
            first = False
            item = self._class_item()
            if isinstance(item, set):
                byte_values |= item
                continue
            lo_code = item  # a unicode codepoint (``\xHH`` yields its byte)
            if self._peek() == "-" and self.pat[self.i + 1 : self.i + 2] not in ("]", ""):
                self.i += 1
                hi_item = self._class_item()
                if isinstance(hi_item, set):
                    raise ValueError("invalid char-class range endpoint")
                for code in range(lo_code, hi_item + 1):
                    if code < 128:
                        byte_values.add(code)
                    else:
                        multi.append(self._literal(chr(code)))
            else:
                bs = chr(lo_code).encode("utf-8")
                if len(bs) == 1:
                    byte_values.add(bs[0])
                else:
                    multi.append(self._literal(chr(lo_code)))
        if negate:
            byte_values = set(range(256)) - byte_values
            # negated classes are byte-level only (no multi-byte subtraction)
            return self._byte_set(byte_values)
        frag = self._byte_set(byte_values) if byte_values else None
        frags = ([frag] if frag else []) + multi
        if len(frags) == 1:
            return frags[0]
        s, a = self.nfa.new_state(), self.nfa.new_state()
        for fs, fa in frags:
            self.nfa.add_edge(s, EPS, fs)
            self.nfa.add_edge(fa, EPS, a)
        return s, a

    def _class_item(self):
        """One char-class item: a codepoint (int) or an escape byte-set."""
        c = self.pat[self.i]
        self.i += 1
        if c != "\\":
            return ord(c)
        e = self.pat[self.i]
        self.i += 1
        if e in self.ESCAPE_CLASSES:
            return set(self.ESCAPE_CLASSES[e])
        if e in ("D", "W", "S"):
            return set(range(256)) - self.ESCAPE_CLASSES[e.lower()]
        if e == "x":
            hx = self.pat[self.i : self.i + 2]
            self.i += 2
            return int(hx, 16)
        return ord(e)

    def _peek(self) -> Optional[str]:
        return self.pat[self.i] if self.i < len(self.pat) else None


class LazyDFA:
    """Subset-construction DFA built on demand over byte labels."""

    DEAD = -2

    def __init__(self, pattern: str):
        nfa, start, accept = RegexParser(pattern).parse()
        self.nfa = nfa
        self.accept_nfa = accept
        self._closure_cache: Dict[FrozenSet[int], FrozenSet[int]] = {}
        self.start = self._intern(self._eps_closure(frozenset([start])))
        self.states: Dict[FrozenSet[int], int] = {}
        # intern mapping already used in _intern; re-register start
        self.trans: Dict[Tuple[int, int], int] = {}

    _interned: Dict[FrozenSet[int], int]

    def _intern(self, sset: FrozenSet[int]) -> int:
        if not hasattr(self, "_interned_map"):
            self._interned_map: Dict[FrozenSet[int], int] = {}
            self._sets: List[FrozenSet[int]] = []
        if sset not in self._interned_map:
            self._interned_map[sset] = len(self._sets)
            self._sets.append(sset)
        return self._interned_map[sset]

    def _eps_closure(self, states: FrozenSet[int]) -> FrozenSet[int]:
        if states in self._closure_cache:
            return self._closure_cache[states]
        out = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for t in self.nfa.transitions[s].get(EPS, ()):
                if t not in out:
                    out.add(t)
                    stack.append(t)
        res = frozenset(out)
        self._closure_cache[states] = res
        return res

    def step(self, state: int, byte: int) -> int:
        """DFA transition; returns DEAD if no match."""
        if state == self.DEAD:
            return self.DEAD
        key = (state, byte)
        if key in self.trans:
            return self.trans[key]
        sset = self._sets[state]
        nxt: Set[int] = set()
        for s in sset:
            nxt |= self.nfa.transitions[s].get(byte, set())
        if not nxt:
            res = self.DEAD
        else:
            res = self._intern(self._eps_closure(frozenset(nxt)))
        self.trans[key] = res
        return res

    def is_accepting(self, state: int) -> bool:
        if state == self.DEAD:
            return False
        return self.accept_nfa in self._sets[state]

    def is_dead(self, state: int) -> bool:
        return state == self.DEAD

    def accepts(self, data: bytes) -> bool:
        s = self.start
        for b in data:
            s = self.step(s, b)
            if s == self.DEAD:
                return False
        return self.is_accepting(s)

    def allowed_bytes(self, state: int) -> List[int]:
        """Bytes with a live transition out of ``state``."""
        if state == self.DEAD:
            return []
        sset = self._sets[state]
        out = set()
        for s in sset:
            for label in self.nfa.transitions[s]:
                if label != EPS:
                    out.add(label)
        return sorted(out)

    def forced_path(self, state: int, max_len: int = 512) -> bytes:
        """The unique forced byte continuation from ``state`` — the
        jump-forward string (reference `outlines_jump_forward.py`,
        xgrammar's jump-ahead): follow states that allow EXACTLY ONE next
        byte and are not accepting (an accepting state makes stopping an
        alternative) until a branch, an accept, or ``max_len``."""
        out = bytearray()
        s = state
        while len(out) < max_len:
            if s == self.DEAD or self.is_accepting(s):
                break
            allowed = self.allowed_bytes(s)
            if len(allowed) != 1:
                break
            b = allowed[0]
            out.append(b)
            s = self.step(s, b)
        return bytes(out)
