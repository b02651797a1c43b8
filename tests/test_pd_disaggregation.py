"""PD disaggregation: prefill on one engine, KV handoff, decode on another
(reference `disaggregation/` prefill/decode event loops + KV transfer;
`test_disaggregation.py` pattern with both servers on one node)."""

import aiohttp
import numpy as np

# xdist workers oversubscribe 4 CPUs; aiohttp's default 300s total
# client timeout then trips on long-poll + compile stalls
CLIENT_TIMEOUT = aiohttp.ClientTimeout(total=900)
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def test_prefill_decode_split(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("pd_model")
    hf.save_pretrained(d, safe_serialization=True)

    common = dict(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    prefill = Engine(**common, disaggregation_mode="prefill")
    decode = Engine(**common, disaggregation_mode="decode")
    try:
        rng = np.random.default_rng(0)
        for n in (9, 26):
            prompt = rng.integers(3, VOCAB, size=n).tolist()
            sp = {"max_new_tokens": 6, "temperature": 0.0}

            handoff = prefill.prefill_only(prompt, sp)
            assert handoff.first_token >= 0
            assert handoff.kv_data.shape[3] == n  # KV rows for every token

            out = decode.inject_decode(handoff, sp)
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([prompt]), max_new_tokens=6, do_sample=False
                )[0][n:].tolist()
            assert out["output_ids"] == ref, f"{out['output_ids']} != {ref}"

        # streaming through the decode side
        prompt = rng.integers(3, VOCAB, size=7).tolist()
        handoff = prefill.prefill_only(prompt, sp)
        chunks = list(decode.inject_decode(handoff, sp, stream=True))
        assert chunks[-1]["meta_info"]["finish_reason"] is not None
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False
            )[0][7:].tolist()
        assert chunks[-1]["output_ids"] == ref
    finally:
        prefill.shutdown()
        decode.shutdown()


async def test_pd_over_http(tmp_path_factory, loop):
    """Full HTTP path: POST /prefill_only on the prefill server, forward
    the npz KV body to /receive_prefill on the decode server."""
    import json as _json

    from aiohttp.test_utils import TestClient, TestServer

    from sglang_npu_tpu.entrypoints.http_server import HttpServer

    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(3)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("pd_http_model")
    hf.save_pretrained(d, safe_serialization=True)
    common = dict(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    pe = Engine(**common, disaggregation_mode="prefill")
    de = Engine(**common, disaggregation_mode="decode")
    pc = TestClient(TestServer(HttpServer(pe).build_app()), timeout=CLIENT_TIMEOUT)
    dc = TestClient(TestServer(HttpServer(de).build_app()), timeout=CLIENT_TIMEOUT)
    await pc.start_server()
    await dc.start_server()
    try:
        prompt = [5, 9, 14, 33, 7, 21]
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        resp = await pc.post(
            "/prefill_only", json={"input_ids": prompt, "sampling_params": sp}
        )
        assert resp.status == 200
        body = await resp.read()
        rid = resp.headers["X-Rid"]
        resp2 = await dc.post(
            "/receive_prefill",
            data=body,
            headers={"X-Sampling-Params": _json.dumps(sp), "X-Rid": rid},
        )
        assert resp2.status == 200
        out = await resp2.json()
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=5, do_sample=False
            )[0][6:].tolist()
        assert out["output_ids"] == ref
    finally:
        await pc.close()
        await dc.close()
        pe.shutdown()
        de.shutdown()


@pytest.mark.parametrize("transfer", ["http", "shm"])
async def test_pd_room_direct_transfer(tmp_path_factory, loop, transfer):
    """Bootstrap-room flow (disaggregation/ transfer engines): decode
    registers a room via /pd_register (long-poll); prefill pushes the KV
    DIRECTLY to the decode server (http = packed payload, shm = /dev/shm
    metadata-only fast path); no byte relaying through a router."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from sglang_npu_tpu.entrypoints.http_server import HttpServer

    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(4)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp(f"pd_room_{transfer}")
    hf.save_pretrained(d, safe_serialization=True)
    common = dict(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    pe = Engine(**common, disaggregation_mode="prefill")
    de = Engine(**common, disaggregation_mode="decode")
    pc = TestClient(TestServer(HttpServer(pe).build_app()), timeout=CLIENT_TIMEOUT)
    dc = TestClient(TestServer(HttpServer(de).build_app()), timeout=CLIENT_TIMEOUT)
    await pc.start_server()
    await dc.start_server()
    try:
        prompt = [5, 9, 14, 33, 7, 21]
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        decode_url = str(dc.server.make_url("/")).rstrip("/")
        room = "room-test-1"
        reg = asyncio.ensure_future(
            dc.post(
                "/pd_register",
                json={"room": room, "sampling_params": sp, "timeout": 60},
            )
        )
        resp = await pc.post(
            "/prefill_only",
            json={
                "input_ids": prompt,
                "sampling_params": sp,
                "room": room,
                "decode_url": decode_url,
                "transfer": transfer,
            },
        )
        assert resp.status == 200
        ack = await resp.json()
        assert ack["transferred"] and ack["room"] == room
        dec = await reg
        assert dec.status == 200
        out = await dec.json()
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=5, do_sample=False
            )[0][6:].tolist()
        assert out["output_ids"] == ref
    finally:
        await pc.close()
        await dc.close()
        pe.shutdown()
        de.shutdown()
