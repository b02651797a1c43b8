"""Streaming tool-call parsing + dfs-weight / in-batch-dedup scheduling.

Reference behaviors: `srt/function_call/base_format_detector.py`
(parse_streaming_increment with partial json), `srt/managers/
schedule_policy.py` (dfs-weight priority, in-batch prefix caching check).
"""

import json

import pytest

from sglang_npu_tpu.function_call.streaming import StreamingToolCallParser


def _feed_chunks(parser, text, n=3):
    """Feed text in n-char chunks; collect all deltas."""
    out = []
    for i in range(0, len(text), n):
        out.extend(parser.feed(text[i:i + n]))
    out.extend(parser.finish())
    return out


def _join_args(deltas, index=0):
    name = None
    args = ""
    for d in deltas:
        for tc in d.get("tool_calls", []):
            if tc["index"] != index:
                continue
            fn = tc.get("function", {})
            if fn.get("name"):
                name = fn["name"]
            args += fn.get("arguments", "")
    return name, args


def test_hermes_streaming_name_first_then_fragments():
    p = StreamingToolCallParser()
    text = (
        'I will check. <tool_call>{"name": "get_weather", '
        '"arguments": {"city": "Paris", "unit": "C"}}</tool_call> done'
    )
    deltas = _feed_chunks(p, text, n=4)
    # content before and after the call streams as text
    content = "".join(d.get("content", "") for d in deltas)
    assert content == "I will check.  done"
    name, args = _join_args(deltas)
    assert name == "get_weather"
    assert json.loads(args) == {"city": "Paris", "unit": "C"}
    # the name arrived before any argument fragment
    first_tc = next(d for d in deltas if d.get("tool_calls"))
    assert first_tc["tool_calls"][0]["function"]["name"] == "get_weather"
    # arguments arrived in >1 fragment (genuinely streamed)
    frags = [
        tc["function"].get("arguments", "")
        for d in deltas for tc in d.get("tool_calls", [])
    ]
    assert sum(1 for f in frags if f) > 1


def test_hermes_marker_prefix_never_leaks():
    p = StreamingToolCallParser()
    # chunk boundary splits the marker
    out = []
    out.extend(p.feed("hello <tool_"))
    leaked = "".join(d.get("content", "") for d in out)
    assert "<tool_" not in leaked
    out.extend(p.feed('call>{"name": "f", "arguments": {}}</tool_call>'))
    out.extend(p.finish())
    name, args = _join_args(out)
    assert name == "f" and json.loads(args) == {}
    content = "".join(d.get("content", "") for d in out)
    assert content == "hello "


def test_held_prefix_flushes_when_not_a_marker():
    p = StreamingToolCallParser()
    out = p.feed("a < b")
    out += p.feed(" and more")
    out += p.finish()
    assert "".join(d.get("content", "") for d in out) == "a < b and more"


def test_mistral_buffered_calls():
    p = StreamingToolCallParser()
    text = (
        '[TOOL_CALLS] [{"name": "a", "arguments": {"x": 1}}, '
        '{"name": "b", "arguments": {}}]'
    )
    deltas = _feed_chunks(p, text, n=5)
    n0, a0 = _join_args(deltas, 0)
    n1, a1 = _join_args(deltas, 1)
    assert (n0, json.loads(a0)) == ("a", {"x": 1})
    assert (n1, json.loads(a1)) == ("b", {})


def test_bare_json_call_and_plain_json_text():
    p = StreamingToolCallParser()
    deltas = _feed_chunks(p, '{"name": "f", "arguments": {"k": "v"}}')
    name, args = _join_args(deltas)
    assert name == "f" and json.loads(args) == {"k": "v"}

    p = StreamingToolCallParser()
    deltas = _feed_chunks(p, '{"just": "data"}')
    assert "".join(d.get("content", "") for d in deltas) == '{"just": "data"}'


def test_two_sequential_hermes_calls():
    p = StreamingToolCallParser()
    text = (
        '<tool_call>{"name": "a", "arguments": {}}</tool_call>\n'
        '<tool_call>{"name": "b", "arguments": {"q": 2}}</tool_call>'
    )
    deltas = _feed_chunks(p, text, n=7)
    assert _join_args(deltas, 0)[0] == "a"
    n1, a1 = _join_args(deltas, 1)
    assert n1 == "b" and json.loads(a1) == {"q": 2}


# ----------------------------------------------------------------------
# scheduling policies
# ----------------------------------------------------------------------
def _mk_req(rid, ids):
    from sglang_npu_tpu.managers.schedule_batch import Req
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    return Req(
        rid=rid, origin_input_text=None, origin_input_ids=ids,
        sampling_params=SamplingParams(max_new_tokens=4, ignore_eos=True),
    )


def test_dfs_weight_groups_shared_prefixes():
    from sglang_npu_tpu.managers.schedule_batch import Req
    from sglang_npu_tpu.managers.schedule_policy import SchedulePolicy
    from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
    from sglang_npu_tpu.mem_cache.radix_cache import RadixCache

    al = PagedAllocator(64, 4)
    cache = RadixCache(al, 4)
    # seed the tree with two cached prefixes, A (heavier) and B
    for seed, toks in (("A", list(range(1, 9))), ("B", list(range(50, 58)))):
        r = _mk_req(f"seed{seed}", toks)
        r.kv_slots = al.alloc_extend(0, len(toks), r.pages)
        r.fill_ids = list(toks)
        cache.cache_finished_req(r)

    a1 = _mk_req("a1", list(range(1, 9)) + [100])
    a2 = _mk_req("a2", list(range(1, 9)) + [101])
    b1 = _mk_req("b1", list(range(50, 58)) + [102])
    c1 = _mk_req("c1", [200, 201, 202])  # no cached prefix
    queue = [b1, c1, a1, a2]
    pol = SchedulePolicy("dfs-weight", cache)
    pol.calc_priority(queue, page_size=4)
    assert pol.effective_policy == "dfs-weight"
    # A-group (2 reqs) first, then B, then the unmatched request
    assert [r.rid for r in queue] == ["a1", "a2", "b1", "c1"]


def test_in_batch_prefix_dedup_defers_twins():
    from sglang_npu_tpu.managers.schedule_policy import SchedulePolicy
    from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
    from sglang_npu_tpu.mem_cache.radix_cache import RadixCache

    al = PagedAllocator(64, 4)
    cache = RadixCache(al, 4)
    shared = list(range(1, 40))  # long uncached shared prefix
    r1 = _mk_req("r1", shared + [100])
    r2 = _mk_req("r2", shared + [101])
    r3 = _mk_req("r3", list(range(200, 240)))
    queue = [r1, r2, r3]
    pol = SchedulePolicy("lpm", cache)
    pol.calc_priority(queue, page_size=4)
    flags = {r.rid: r.defer_in_batch for r in queue}
    assert flags["r2"] or flags["r1"]  # one twin deferred
    assert not (flags["r1"] and flags["r2"])  # but not both
    assert not flags["r3"]


def test_dedup_e2e_identical_outputs(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from sglang_npu_tpu.entrypoints.engine import Engine

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("dedup_model")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, schedule_policy="dfs-weight",
    )
    try:
        import numpy as np

        shared = np.random.default_rng(0).integers(3, 128, size=40).tolist()
        prompts = [shared + [i] for i in (5, 7, 9)] + [[11, 12, 13]]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 5, "temperature": 0.0,
                             "ignore_eos": True},
        )
        for p, o in zip(prompts, outs):
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=5, do_sample=False
                )[0][len(p):].tolist()
            assert o["output_ids"] == ref
    finally:
        e.shutdown()
