"""Pushdown grammar machine: recursive JSON schemas for constrained decode.

The built-in FSM backend compiles schemas to regular languages
(`json_schema.py`), which caps recursion (depth 8) and rejects `$ref`
cycles — a visible gap vs the reference's xgrammar backend
(`constrained/xgrammar_backend.py`), whose grammars are context-free.
This module adds the missing pushdown power:

  * A CFG whose terminals are REGEX ISLANDS (compiled `LazyDFA`s) and
    whose nonterminals may recurse.  The flat, already-regular schema
    parts stay single DFA islands; only true recursion points become
    grammar calls.
  * `PushdownMachine` simulates the PDA as a set of configurations
    (stacks of production frames), interned per config-set so it exposes
    the exact `LazyDFA` surface (`start/step/is_dead/is_accepting/
    allowed_bytes/forced_path`).  `FsmGrammar` and the token-trie mask
    walker (`token_vocab.compute_mask`) therefore work unchanged; the
    device-FSM fast path simply does not apply (`device=None` keeps such
    requests on the host per-token path, like the reference's unfused
    grammar mode).

Scope: `$ref` to `#`, `#/$defs/...`, `#/definitions/...` (arbitrary
json-pointer paths), recursion through objects/arrays/anyOf/oneOf;
everything non-recursive inherits `schema_to_regex` semantics verbatim.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

from sglang_npu_tpu.constrained.json_schema import WS, schema_to_regex
from sglang_npu_tpu.constrained.regex_engine import LazyDFA

# grammar item: ("re", LazyDFA) | ("nt", name)
Item = Tuple[str, Any]
MAX_CONFIGS = 512  # sanity bound on simultaneous PDA configurations


class PushdownMachine:
    """Config-set PDA simulation with LazyDFA's interface.

    A configuration is a tuple of frames (prod_key, item_idx, dfa_state)
    — `prod_key = (nt, alt_idx)` — with the TOP frame active.  The empty
    configuration () marks "start symbol completed" (accepting)."""

    def __init__(self, prods: Dict[str, List[List[Item]]], start: str):
        self.prods = prods
        self.start_nt = start
        self._ids: Dict[frozenset, int] = {}
        self._sets: List[frozenset] = []
        self._step_cache: Dict[Tuple[int, int], int] = {}
        init = set()
        self._enter_nt(start, (), init)
        self.start = self._intern(frozenset(init))

    # -- closure ------------------------------------------------------
    def _enter_nt(self, nt: str, stack: tuple, out: set, depth: int = 0):
        if depth > 64:
            raise ValueError("grammar closure too deep")
        for ai, alt in enumerate(self.prods[nt]):
            self._at_item(stack + ((nt, ai, 0, None),), out, depth + 1)

    def _at_item(self, cfg: tuple, out: set, depth: int = 0):
        """Position a configuration at its next consumable point."""
        if depth > 128 or len(out) > MAX_CONFIGS:
            raise ValueError("pushdown config explosion")
        if not cfg:
            out.add(())  # start symbol fully derived
            return
        nt, ai, ii, sub = cfg[-1]
        alt = self.prods[nt][ai]
        if ii >= len(alt):
            # production complete: pop, advance the parent
            parent = cfg[:-1]
            if not parent:
                out.add(())
                return
            pnt, pai, pii, _ = parent[-1]
            self._at_item(
                parent[:-1] + ((pnt, pai, pii + 1, None),), out, depth + 1
            )
            return
        kind, payload = alt[ii]
        if kind == "nt":
            self._enter_nt(payload, cfg[:-1] + ((nt, ai, ii, None),), out,
                           depth + 1)
            return
        # regex island: position at its start state (if not already inside)
        dfa: LazyDFA = payload
        s = sub if sub is not None else dfa.start
        out.add(cfg[:-1] + ((nt, ai, ii, s),))
        if dfa.is_accepting(s):
            # the island may also complete here (epsilon through it)
            self._at_item(cfg[:-1] + ((nt, ai, ii + 1, None),), out,
                          depth + 1)

    # -- LazyDFA surface ----------------------------------------------
    def _intern(self, cfgs: frozenset) -> int:
        sid = self._ids.get(cfgs)
        if sid is None:
            sid = len(self._sets)
            self._ids[cfgs] = sid
            self._sets.append(cfgs)
        return sid

    def step(self, state: int, byte: int) -> int:
        key = (state, byte)
        hit = self._step_cache.get(key)
        if hit is not None:
            return hit
        out: set = set()
        for cfg in self._sets[state]:
            if not cfg:
                continue  # completed: consumes nothing further
            nt, ai, ii, sub = cfg[-1]
            item = self.prods[nt][ai][ii]
            assert item[0] == "re", item  # closure leaves only islands on top
            dfa: LazyDFA = item[1]
            ns = dfa.step(sub, byte)
            if dfa.is_dead(ns):
                continue
            self._at_item(cfg[:-1] + ((nt, ai, ii, ns),), out)
        sid = self._intern(frozenset(out))
        self._step_cache[key] = sid
        return sid

    def is_dead(self, state: int) -> bool:
        return not self._sets[state]

    def is_accepting(self, state: int) -> bool:
        return () in self._sets[state]

    def allowed_bytes(self, state: int) -> List[int]:
        allowed = set()
        for cfg in self._sets[state]:
            if not cfg:
                continue
            nt, ai, ii, sub = cfg[-1]
            dfa = self.prods[nt][ai][ii][1]
            allowed.update(dfa.allowed_bytes(sub))
        return sorted(allowed)

    def forced_path(self, state: int, max_len: int = 512) -> bytes:
        out = []
        s = state
        while len(out) < max_len:
            if self.is_accepting(s):
                break
            ab = self.allowed_bytes(s)
            if len(ab) != 1:
                break
            out.append(ab[0])
            s = self.step(s, ab[0])
        return bytes(out)


# ----------------------------------------------------------------------
# JSON schema -> CFG
# ----------------------------------------------------------------------
def _resolve_pointer(root: Dict[str, Any], ref: str) -> Tuple[str, Any]:
    if not ref.startswith("#"):
        raise ValueError(f"unsupported external $ref {ref!r}")
    node: Any = root
    for seg in [s for s in ref[1:].split("/") if s]:
        seg = seg.replace("~1", "/").replace("~0", "~")
        node = node[seg]
    return ref, node


def _has_ref(schema: Any) -> bool:
    if isinstance(schema, dict):
        if "$ref" in schema:
            return True
        return any(_has_ref(v) for v in schema.values())
    if isinstance(schema, list):
        return any(_has_ref(v) for v in schema)
    return False


class _CfgBuilder:
    def __init__(self, root: Dict[str, Any]):
        self.root = root
        self.prods: Dict[str, List[List[Item]]] = {}
        self._n = 0

    def fresh(self, hint: str) -> str:
        self._n += 1
        return f"{hint}#{self._n}"

    def _re(self, pattern: str) -> Item:
        return ("re", LazyDFA(pattern))

    def seq_for(self, schema: Any) -> List[Item]:
        """Item sequence recognizing `schema`; flat parts collapse into
        one regex island."""
        if isinstance(schema, dict) and "$ref" in schema:
            ptr, node = _resolve_pointer(self.root, schema["$ref"])
            name = f"ref:{ptr}"
            if name not in self.prods:
                self.prods[name] = []  # reserve (breaks the cycle)
                self.prods[name] = [self.seq_for(node)]
            return [("nt", name)]
        if not _has_ref(schema):
            try:
                return [self._re(schema_to_regex(schema))]
            except ValueError:
                pass  # deeper than the regex builder's cap: decompose
        t = schema.get("type") if isinstance(schema, dict) else None
        if isinstance(schema, dict) and (
            "anyOf" in schema or "oneOf" in schema
        ):
            branches = schema.get("anyOf") or schema.get("oneOf")
            name = self.fresh("any")
            self.prods[name] = []
            self.prods[name] = [self.seq_for(b) for b in branches]
            return [("nt", name)]
        if t == "array":
            inner = self.seq_for(schema.get("items", {}))
            items = self.fresh("items")
            self.prods[items] = []
            self.prods[items] = [
                inner,
                inner + [self._re(WS + "," + WS), ("nt", items)],
            ]
            arr = self.fresh("array")
            alts = [[self._re(r"\[" + WS), ("nt", items), self._re(WS + r"\]")]]
            if schema.get("minItems", 0) == 0:
                alts.append([self._re(r"\[" + WS + r"\]")])
            self.prods[arr] = alts
            return [("nt", arr)]
        if t == "object" or (isinstance(schema, dict) and "properties" in schema):
            props = schema.get("properties", {})
            required = set(schema.get("required", list(props.keys())))
            seq: List[Item] = [self._re(r"\{" + WS)]
            first = True
            for pname, sub in props.items():
                key = json.dumps(pname)
                lead = "" if first else WS + "," + WS
                pair = [
                    self._re(
                        lead
                        + "".join(
                            "\\" + c if c in r'\.[]{}()*+?|^$/' else c
                            for c in key
                        )
                        + WS + ":" + WS
                    ),
                ] + self.seq_for(sub)
                if pname in required:
                    seq.extend(pair)
                else:
                    opt = self.fresh("opt")
                    self.prods[opt] = [pair, []]
                    seq.append(("nt", opt))
                first = False
            seq.append(self._re(WS + r"\}"))
            return seq
        # recursive leaf we do not decompose further: fall back to the
        # regex builder with refs resolved one level (loud if truly cyclic)
        return [self._re(schema_to_regex(schema))]


def build_json_pushdown(json_schema_str: str) -> PushdownMachine:
    schema = (
        json.loads(json_schema_str)
        if isinstance(json_schema_str, str)
        else json_schema_str
    )
    b = _CfgBuilder(schema)
    start_seq = b.seq_for(schema)
    b.prods["__start__"] = [start_seq]
    return PushdownMachine(b.prods, "__start__")


def schema_needs_pushdown(json_schema_str: str) -> bool:
    """True when the regular-language compiler cannot express the schema:
    $ref anywhere (possible recursion) or nesting past its depth cap."""
    try:
        schema = (
            json.loads(json_schema_str)
            if isinstance(json_schema_str, str)
            else json_schema_str
        )
    except Exception:
        return False
    if _has_ref(schema):
        return True
    try:
        schema_to_regex(schema)
        return False
    except ValueError:
        return True
