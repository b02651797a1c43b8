"""W4A16 quantization: packing, RTN quantize, AWQ/GPTQ ingestion, Pallas
dequant-matmul (interpret mode), and end-to-end engine generation.

Reference behaviors: `layers/quantization/awq.py` (autoawq GEMM unpack),
`gptq.py` (AutoGPTQ row packing + zeros-1 convention), `fp8.py`.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from sglang_npu_tpu.layers.quantization import (
    QuantizedWeightW4,
    dequant,
    pack_w4,
    quantize_params_fp8,
    quantize_params_w4,
    unpack_w4,
)
from sglang_npu_tpu.model_loader.quant_ingest import (
    AWQ_ORDER,
    awq_to_w4,
    gptq_to_w4,
    pack_w4_np,
)

VOCAB = 128


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q4 = rng.integers(0, 16, size=(256, 64), dtype=np.uint8)
    packed = pack_w4(jnp.asarray(q4), 128)
    assert packed.shape == (128, 64)
    back = np.asarray(unpack_w4(packed, 128))
    np.testing.assert_array_equal(back, q4)
    # numpy twin must agree
    np.testing.assert_array_equal(np.asarray(packed), pack_w4_np(q4, 128))


def test_w4_dequant_close_to_dense():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 64)).astype(np.float32)
    params = {"layers": {"wq": jnp.asarray(w)}}
    out = quantize_params_w4(params, group_size=128)
    qw = out["layers"]["wq"]
    assert isinstance(qw, QuantizedWeightW4)
    wd = np.asarray(dequant(qw, jnp.float32))
    # 4-bit asymmetric per-128-group: worst-case error = step/2
    grp = w.reshape(2, 128, 64)
    step = (grp.max(1) - grp.min(1)) / 15.0
    err = np.abs(wd.reshape(2, 128, 64) - grp)
    assert np.all(err <= step[:, None, :] * 0.51 + 1e-6)


def test_fp8_dequant_close():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    params = {"layers": {"wq": jnp.asarray(w)}}
    out = quantize_params_fp8(params)
    wd = np.asarray(dequant(out["layers"]["wq"], jnp.float32))
    assert np.max(np.abs(wd - w) / (np.abs(w) + 1e-3)) < 0.07


def _pack_awq_cols(vals: np.ndarray) -> np.ndarray:
    """Pack uint8 nibbles [R, C] -> int32 [R, C//8] with AWQ interleave."""
    R, C = vals.shape
    out = np.zeros((R, C // 8), dtype=np.int32)
    v = vals.reshape(R, C // 8, 8).astype(np.uint32)
    for i in range(8):
        out |= (v[:, :, AWQ_ORDER[i]] << (4 * i)).astype(np.int32)
    return out


def _pack_gptq_rows(vals: np.ndarray) -> np.ndarray:
    """Pack uint8 nibbles [R, C] -> int32 [R//8, C] sequential rows."""
    R, C = vals.shape
    v = vals.reshape(R // 8, 8, C).astype(np.uint32)
    out = np.zeros((R // 8, C), dtype=np.uint32)
    for i in range(8):
        out |= v[:, i] << (4 * i)
    return out.astype(np.int32)


def _pack_gptq_cols(vals: np.ndarray) -> np.ndarray:
    R, C = vals.shape
    v = vals.reshape(R, C // 8, 8).astype(np.uint32)
    out = np.zeros((R, C // 8), dtype=np.uint32)
    for i in range(8):
        out |= v[:, :, i] << (4 * i)
    return out.astype(np.int32)


def test_awq_ingest_matches_reference_dequant():
    rng = np.random.default_rng(3)
    K, N, g = 256, 64, 128
    q4 = rng.integers(0, 16, size=(K, N), dtype=np.uint8)
    zeros = rng.integers(0, 16, size=(K // g, N), dtype=np.uint8)
    scales = (rng.random((K // g, N)) * 0.1 + 0.01).astype(np.float16)

    qweight = _pack_awq_cols(q4)
    qzeros = _pack_awq_cols(zeros)
    got_q4, s, b, perm = awq_to_w4(qweight, qzeros, scales)
    np.testing.assert_array_equal(got_q4, q4)
    assert perm is None

    # reference dequant: (q - z) * s, expanded per group
    ref = (
        q4.reshape(K // g, g, N).astype(np.float32)
        - zeros[:, None, :].astype(np.float32)
    ) * scales[:, None, :].astype(np.float32)
    w = QuantizedWeightW4(
        q=jnp.asarray(pack_w4_np(got_q4, g)),
        s=jnp.asarray(s),
        b=jnp.asarray(b),
    )
    wd = np.asarray(dequant(w, jnp.float32)).reshape(K // g, g, N)
    np.testing.assert_allclose(wd, ref, rtol=1e-5, atol=1e-5)


def test_gptq_ingest_with_act_order():
    rng = np.random.default_rng(4)
    K, N, g = 256, 32, 128
    q4 = rng.integers(0, 16, size=(K, N), dtype=np.uint8)
    zeros = rng.integers(1, 15, size=(K // g, N), dtype=np.uint8)
    scales = (rng.random((K // g, N)) * 0.1 + 0.01).astype(np.float16)
    # act-order: shuffled group assignment
    g_idx = rng.permutation(np.arange(K) // g).astype(np.int32)

    qweight = _pack_gptq_rows(q4)
    qzeros = _pack_gptq_cols(zeros - 1)  # checkpoint stores z-1
    got_q4, s, b, perm = gptq_to_w4(qweight, qzeros, scales, g_idx)
    assert perm is not None

    # reference dequant in original activation order
    ref = (
        q4.astype(np.float32) - zeros[g_idx].astype(np.float32)
    ) * scales[g_idx].astype(np.float32)
    w = QuantizedWeightW4(
        q=jnp.asarray(pack_w4_np(got_q4, g)),
        s=jnp.asarray(s),
        b=jnp.asarray(b),
        perm=jnp.asarray(perm),
    )
    wd = np.asarray(dequant(w, jnp.float32))
    np.testing.assert_allclose(wd, ref, rtol=1e-5, atol=1e-5)


def test_pallas_w4_matmul_interpret():
    from sglang_npu_tpu.ops.pallas.quant_matmul import matmul_w4

    rng = np.random.default_rng(5)
    M, K, N, g = 4, 256, 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    params = {"layers": {"wq": jnp.asarray(w)}}
    qw = quantize_params_w4(params, group_size=g)["layers"]["wq"]
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    ref = np.asarray(x @ dequant(qw, jnp.float32))
    got = np.asarray(
        matmul_w4(x, qw.q, qw.s, qw.b, group_size=g, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=256,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        tie_word_embeddings=False,
        torch_dtype="float32",
        eos_token_id=2,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("w4_model")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_engine_w4a16_generates(tiny_model_dir):
    """End-to-end: --quantization w4a16 runs and agrees with explicit
    W4-dequantized logits (self-consistency, not HF parity — RTN W4 on a
    random model is lossy by design)."""
    from sglang_npu_tpu.entrypoints.engine import Engine

    path, _ = tiny_model_dir
    e = Engine(
        model_path=path,
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=4,
        max_total_tokens=2048,
        attention_backend="xla",
        random_seed=0,
        quantization="w4a16",
    )
    try:
        prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=9))
        out = e.generate(
            input_ids=prompt,
            sampling_params={
                "max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True
            },
        )
        assert len(out["output_ids"]) == 6
        assert all(0 <= t < VOCAB for t in out["output_ids"])
    finally:
        e.shutdown()


def test_awq_checkpoint_loads_end_to_end(tiny_model_dir, tmp_path):
    """Write a synthetic AWQ checkpoint (real autoawq tensor layout) for
    the tiny model and verify greedy output matches the dense model with
    RTN-W4 weights (same quantized values by construction)."""
    import json
    import shutil

    from safetensors import safe_open
    from safetensors.numpy import save_file

    from sglang_npu_tpu.entrypoints.engine import Engine

    path, hf = tiny_model_dir
    g = 128
    awq_dir = tmp_path / "awq_model"
    awq_dir.mkdir()
    # config with quantization_config
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "awq", "bits": 4, "group_size": g, "version": "gemm",
    }
    with open(awq_dir / "config.json", "w") as f:
        json.dump(cfg, f)

    # Build AWQ tensors from the dense weights via RTN (per linear)
    lin_names = [
        "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
        "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
    ]
    tensors = {}
    src = {}
    import glob as _glob

    for fp in _glob.glob(os.path.join(path, "*.safetensors")):
        with safe_open(fp, framework="np") as f:
            for n in f.keys():
                src[n] = f.get_tensor(n)
    for name, arr in src.items():
        is_lin = any(f".{ln}.weight" in name for ln in lin_names)
        if not is_lin:
            tensors[name] = arr
            continue
        w = arr.T.astype(np.float32)  # [K, N]
        K, N = w.shape
        grp = w.reshape(K // g, g, N)
        wmax, wmin = grp.max(1), grp.min(1)
        s = np.maximum((wmax - wmin) / 15.0, 1e-10)
        z = np.clip(np.round(-wmin / s), 0, 15)
        q = np.clip(np.round(grp / s[:, None] + z[:, None]), 0, 15).astype(
            np.uint8
        ).reshape(K, N)
        base = name[: -len(".weight")]
        tensors[base + ".qweight"] = _pack_awq_cols(q)
        tensors[base + ".qzeros"] = _pack_awq_cols(z.astype(np.uint8))
        # ascontiguousarray: safetensors save_file silently corrupts
        # non-contiguous arrays (s inherits Fortran order from w=arr.T)
        tensors[base + ".scales"] = np.ascontiguousarray(
            s.astype(np.float16)
        )
    save_file(tensors, str(awq_dir / "model.safetensors"))

    e = Engine(
        model_path=str(awq_dir),
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=4,
        max_total_tokens=2048,
        attention_backend="xla",
        random_seed=0,
        quantization="awq",
    )
    try:
        # loaded params are W4 stacks (q/k/v fused at tp=1)
        wqkv = e.scheduler.runner.params["layers"]["w_qkv"]
        assert isinstance(wqkv, QuantizedWeightW4)
        import dataclasses as _dc

        q_cols = e.scheduler.runner.model.q_size
        wq = QuantizedWeightW4(
            q=wqkv.q[..., :q_cols],
            s=wqkv.s[..., :q_cols],
            b=wqkv.b[..., :q_cols],
        )
        # dequantized AWQ weights must match the dense weights within the
        # 4-bit group quantization error (+ f16 scale rounding)
        dense = src["model.layers.0.self_attn.q_proj.weight"].T.astype(
            np.float32
        )
        wd = np.asarray(dequant(wq, jnp.float32))[0]
        K = dense.shape[0]
        grp = dense.reshape(K // g, g, -1)
        step = (grp.max(1) - grp.min(1)) / 15.0
        err = np.abs(wd.reshape(K // g, g, -1) - grp)
        assert np.all(err <= step[:, None, :] * 0.51 + 1e-2)

        prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=9))
        out = e.generate(
            input_ids=prompt,
            sampling_params={
                "max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True
            },
        )
        assert len(out["output_ids"]) == 6
        assert all(0 <= t < VOCAB for t in out["output_ids"])
    finally:
        e.shutdown()


def test_pallas_w4a8_matmul_interpret():
    """int8-MXU W4A8 kernel vs the exact-dequant reference: per-token int8
    activation quant bounds the relative error (~1/127 of the row max per
    activation; 4-bit weight error already covered by the A16 test)."""
    from sglang_npu_tpu.ops.pallas.quant_matmul import matmul_w4a8

    rng = np.random.default_rng(6)
    M, K, N, g = 4, 256, 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    params = {"layers": {"wq": jnp.asarray(w)}}
    qw = quantize_params_w4(params, group_size=g)["layers"]["wq"]
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    ref = np.asarray(x @ dequant(qw, jnp.float32))
    got = np.asarray(
        matmul_w4a8(x, qw.q, qw.s, qw.b, group_size=g, interpret=True)
    )
    # activation-quant noise: |err| <~ sum_k |w| * sx/2 — loose bound
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) < 0.05 * scale + 0.05, (
        np.max(np.abs(got - ref)), scale
    )


def test_w8a8_int8_einsum_close():
    """W8A8-INT8 path (per-token int8 act x per-channel int8 weight on the
    int8 MXU) stays within combined quantization error of the f32 ref."""
    from sglang_npu_tpu.layers.quantization import (
        QuantizedWeight,
        _einsum_w8a8,
        quantize_params_int8,
    )

    rng = np.random.default_rng(7)
    M, K, N = 8, 128, 64
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    qw = quantize_params_int8({"layers": {"wq": jnp.asarray(w)}})["layers"]["wq"]
    assert isinstance(qw, QuantizedWeight)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    ref = np.asarray(x) @ (np.asarray(qw.q, np.float32) * np.asarray(qw.s))
    got = np.asarray(_einsum_w8a8(x, qw, "mk,kn->mn"))
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) < 0.02 * scale + 0.02


@pytest.mark.parametrize("method", ["w4a8", "w8a8_int8"])
def test_engine_a8_modes_generate(tiny_model_dir, method):
    """End-to-end: per-token int8 activation modes serve through the Engine
    (reference headline path `w8a8_int8.py`); tokens stay in-vocab and the
    run is deterministic."""
    from sglang_npu_tpu.entrypoints.engine import Engine
    from sglang_npu_tpu.layers.quantization import set_act_quant

    path, _ = tiny_model_dir
    e = Engine(
        model_path=path,
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=4,
        max_total_tokens=2048,
        attention_backend="xla",
        random_seed=0,
        quantization=method,
    )
    try:
        prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=9))
        sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
        out = e.generate(input_ids=prompt, sampling_params=sp)
        out2 = e.generate(input_ids=prompt, sampling_params=sp)
        assert len(out["output_ids"]) == 6
        assert all(0 <= t < VOCAB for t in out["output_ids"])
        assert out["output_ids"] == out2["output_ids"]
    finally:
        e.shutdown()
        set_act_quant(None)  # module flag: don't leak into other tests


def test_pallas_w4a16x2_precision():
    """The int8x2 residual decomposition must be at least as close to the
    exact f32 dequant reference as the bf16-convert kernel (it carries
    ~14 activation mantissa bits vs bf16's 8)."""
    from sglang_npu_tpu.ops.pallas.quant_matmul import (
        matmul_w4,
        matmul_w4a16x2,
    )

    rng = np.random.default_rng(9)
    M, K, N, g = 8, 256, 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qw = quantize_params_w4({"layers": {"wq": jnp.asarray(w)}}, group_size=g)[
        "layers"
    ]["wq"]
    x = jnp.asarray(
        rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16
    )
    ref = np.asarray(
        jnp.asarray(x, jnp.float32) @ dequant(qw, jnp.float32)
    )
    bf = np.asarray(
        matmul_w4(x, qw.q, qw.s, qw.b, group_size=g, interpret=True)
    ).astype(np.float32)
    x2 = np.asarray(
        matmul_w4a16x2(x, qw.q, qw.s, qw.b, group_size=g, interpret=True)
    ).astype(np.float32)
    err_bf = np.abs(bf - ref).max()
    err_x2 = np.abs(x2 - ref).max()
    assert err_x2 <= err_bf * 1.5 + 1e-4, (err_x2, err_bf)
    assert err_x2 < 0.02 * np.abs(ref).max() + 0.02


def test_matmul_w8_int8_and_fp8():
    """Weight-only W8 Pallas kernel (per-output-channel scale on the dot
    output) vs the explicit dequant reference — int8 and fp8-e4m3."""
    import jax
    import jax.numpy as jnp

    from sglang_npu_tpu.ops.pallas.quant_matmul import matmul_w8

    rng = np.random.default_rng(0)
    M, K, N = 24, 256, 384
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    for dtype, qmax in ((jnp.int8, 127.0), (jnp.float8_e4m3fn, 448.0)):
        s = np.abs(w).max(axis=0, keepdims=True) / qmax
        q = w / s
        if dtype == jnp.int8:
            q = np.clip(np.round(q), -127, 127)
        qj = jnp.asarray(q).astype(dtype)
        got = np.asarray(
            matmul_w8(x, qj, jnp.asarray(s), interpret=True)
        )
        ref = np.asarray(x) @ (
            np.asarray(qj.astype(jnp.float32)) * s
        )
        tol = 0.02 * np.abs(ref).max()
        assert np.abs(got - ref).max() <= tol, np.abs(got - ref).max()


def test_pallas_stacked_kernels_match_per_layer():
    """Stacked-layer kernel variants (scalar-prefetched layer index; the
    trunk-scan path that avoids per-layer weight copies) must be bit-exact
    vs the per-layer kernels."""
    import jax
    import jax.numpy as jnp

    from sglang_npu_tpu.ops.pallas.quant_matmul import (
        matmul_w4, matmul_w4_stacked, matmul_w4a8, matmul_w4a8_stacked,
        matmul_w8, matmul_w8_stacked,
    )

    key = jax.random.PRNGKey(0)
    L, M, K, N, g = 3, 16, 256, 256, 128
    qw = jax.random.randint(key, (L, K // 2, N), 0, 255, jnp.int32).astype(
        jnp.uint8
    )
    s = jax.random.uniform(key, (L, K // g, N), jnp.float32, 0.001, 0.01)
    b = s * 8.0
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    q8 = jax.random.randint(key, (L, K, N), -127, 128, jnp.int32).astype(
        jnp.int8
    )
    s8 = jax.random.uniform(key, (L, 1, N), jnp.float32, 0.001, 0.01)
    for l in range(L):
        li = jnp.int32(l)
        np.testing.assert_array_equal(
            np.asarray(matmul_w4_stacked(x, qw, s, b, li, interpret=True)),
            np.asarray(matmul_w4(x, qw[l], s[l], b[l], interpret=True)),
        )
        np.testing.assert_array_equal(
            np.asarray(matmul_w4a8_stacked(x, qw, s, b, li, interpret=True)),
            np.asarray(matmul_w4a8(x, qw[l], s[l], b[l], interpret=True)),
        )
        np.testing.assert_array_equal(
            np.asarray(matmul_w8_stacked(x, q8, s8, li, interpret=True)),
            np.asarray(matmul_w8(x, q8[l], s8[l], interpret=True)),
        )


def test_pallas_w8a8_stacked_matches_xla():
    """int8-MXU W8A8 kernel == the XLA int8 einsum path, bit-exact."""
    import jax
    import jax.numpy as jnp

    from sglang_npu_tpu.layers.quantization import (
        QuantizedWeight, _einsum_w8a8,
    )
    from sglang_npu_tpu.ops.pallas.quant_matmul import matmul_w8a8_stacked

    key = jax.random.PRNGKey(2)
    L, M, K, N = 2, 24, 256, 384
    q8 = jax.random.randint(key, (L, K, N), -127, 128, jnp.int32).astype(
        jnp.int8
    )
    s8 = jax.random.uniform(key, (L, 1, N), jnp.float32, 0.001, 0.01)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    for l in range(L):
        ref = _einsum_w8a8(
            x, QuantizedWeight(q=q8[l], s=s8[l]), "mk,kn->mn"
        )
        got = matmul_w8a8_stacked(x, q8, s8, jnp.int32(l), interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=1e-6, atol=1e-6,
        )


def test_w4_repack_int8_accuracy_and_engine(tmp_path):
    """repack_w4_to_int8: per-channel int8 requant of W4 weights adds
    sub-LSB error, and the repacked engine still greedy-decodes like the
    plain w4a8 engine on a tiny model."""
    import jax.numpy as jnp

    from sglang_npu_tpu.layers.quantization import (
        QuantizedWeight,
        QuantizedWeightW4,
        dequant,
        quantize_params_w4,
        repack_w4_to_int8,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 256, 128)) * 0.02, jnp.float32)
    params = quantize_params_w4({"layers": {"wq": w}})
    w4 = params["layers"]["wq"]
    deq4 = np.asarray(dequant(w4, jnp.float32))
    rp = repack_w4_to_int8(params)
    w8 = rp["layers"]["wq"]
    assert isinstance(w8, QuantizedWeight) and w8.q.dtype == jnp.int8
    deq8 = np.asarray(dequant(w8, jnp.float32))
    # requant error bounded by half an int8 step at the channel amax
    step = np.abs(deq4).max(axis=-2, keepdims=True) / 127.0
    assert (np.abs(deq8 - deq4) <= 0.5001 * step + 1e-9).all()
