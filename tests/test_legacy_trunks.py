"""Round-5 legacy text-arch sweep: xverse, exaone-v1, internlm2(+reward),
qwen-v1, baichuan(rope+alibi), minicpm — HF-parity tests.

These archs are trust-remote-code on HF (no transformers classes), so the
oracle is either (a) a transformers Llama model whose weights are SAVED
UNDER the target checkpoint naming (pure-renaming variants: the forward
math is llama exactly — reference `srt/models/xverse.py:1`, `exaone.py:1`,
`internlm2.py:1`, `qwen.py:1`, rope-mode `baichuan.py:1`), or (b) a
hand-ported torch forward in this file (ALiBi baichuan, muP minicpm).
"""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
st = pytest.importorskip("safetensors.torch")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128
SP = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}

pytestmark = pytest.mark.fast


def tiny_llama(bias=False, kv_heads=2, tie=False):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=kv_heads, max_position_embeddings=256,
        rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=bias,
        tie_word_embeddings=tie, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    m.eval()
    return cfg, m


def save_ckpt(d, cfg_dict, tensors):
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    st.save_file(
        {k: v.contiguous() for k, v in tensors.items()},
        str(d / "model.safetensors"),
    )


def engine_greedy(path, prompt, **kw):
    e = Engine(
        model_path=str(path), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, **kw,
    )
    try:
        out = e.generate(input_ids=[prompt], sampling_params=SP)
        return out[0]["output_ids"][: SP["max_new_tokens"]]
    finally:
        e.shutdown()


def hf_greedy(m, prompt):
    with torch.no_grad():
        ref = m.generate(
            torch.tensor([prompt]), max_new_tokens=SP["max_new_tokens"],
            do_sample=False,
        )
    return ref[0][len(prompt):].tolist()


PROMPT = list(np.random.default_rng(7).integers(3, VOCAB, size=9))


# ----------------------------------------------------------------------
# pure-renaming variants: oracle = the original transformers Llama
# ----------------------------------------------------------------------
def test_xverse(tmp_path):
    cfg, m = tiny_llama()
    cd = cfg.to_dict()
    cd["architectures"] = ["XverseForCausalLM"]
    cd["model_type"] = "xverse"
    save_ckpt(tmp_path, cd, dict(m.state_dict()))
    assert engine_greedy(tmp_path, PROMPT) == hf_greedy(m, PROMPT)


def test_exaone_v1(tmp_path):
    cfg, m = tiny_llama()
    sd = m.state_dict()
    out = {
        "transformer.wte.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(cfg.num_hidden_layers):
        p, o = f"model.layers.{i}.", f"transformer.h.{i}."
        out[o + "ln_1.weight"] = sd[p + "input_layernorm.weight"]
        out[o + "ln_2.weight"] = sd[p + "post_attention_layernorm.weight"]
        out[o + "attn.attention.q_proj.weight"] = sd[p + "self_attn.q_proj.weight"]
        out[o + "attn.attention.k_proj.weight"] = sd[p + "self_attn.k_proj.weight"]
        out[o + "attn.attention.v_proj.weight"] = sd[p + "self_attn.v_proj.weight"]
        out[o + "attn.attention.out_proj.weight"] = sd[p + "self_attn.o_proj.weight"]
        out[o + "mlp.c_fc_0.weight"] = sd[p + "mlp.gate_proj.weight"]
        out[o + "mlp.c_fc_1.weight"] = sd[p + "mlp.up_proj.weight"]
        out[o + "mlp.c_proj.weight"] = sd[p + "mlp.down_proj.weight"]
    cd = {
        "architectures": ["ExaoneForCausalLM"],
        "model_type": "exaone",
        "vocab_size": VOCAB,
        "hidden_size": 64,
        "intermediate_size": 96,
        "num_layers": 3,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "max_position_embeddings": 256,
        "layer_norm_epsilon": 1e-5,
        "rope_theta": 10000.0,
        "torch_dtype": "float32",
        "eos_token_id": 2,
    }
    save_ckpt(tmp_path, cd, out)
    assert engine_greedy(tmp_path, PROMPT) == hf_greedy(m, PROMPT)


def test_internlm2(tmp_path):
    cfg, m = tiny_llama()
    sd = m.state_dict()
    kv, g = 2, 2
    d = 16
    out = {
        "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(cfg.num_hidden_layers):
        p, o = f"model.layers.{i}.", f"model.layers.{i}."
        q = sd[p + "self_attn.q_proj.weight"].reshape(kv, g, d, 64)
        k = sd[p + "self_attn.k_proj.weight"].reshape(kv, 1, d, 64)
        v = sd[p + "self_attn.v_proj.weight"].reshape(kv, 1, d, 64)
        wqkv = torch.cat([q, k, v], dim=1).reshape(-1, 64)
        out[o + "attention.wqkv.weight"] = wqkv
        out[o + "attention.wo.weight"] = sd[p + "self_attn.o_proj.weight"]
        out[o + "attention_norm.weight"] = sd[p + "input_layernorm.weight"]
        out[o + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        out[o + "feed_forward.w1.weight"] = sd[p + "mlp.gate_proj.weight"]
        out[o + "feed_forward.w3.weight"] = sd[p + "mlp.up_proj.weight"]
        out[o + "feed_forward.w2.weight"] = sd[p + "mlp.down_proj.weight"]
    cd = cfg.to_dict()
    cd["architectures"] = ["InternLM2ForCausalLM"]
    cd["model_type"] = "internlm2"
    save_ckpt(tmp_path, cd, out)
    assert engine_greedy(tmp_path, PROMPT) == hf_greedy(m, PROMPT)


def test_qwen_v1(tmp_path):
    cfg, m = tiny_llama(bias=True, kv_heads=4)  # QWen-v1 is MHA + qkv bias
    sd = m.state_dict()
    out = {
        "transformer.wte.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(cfg.num_hidden_layers):
        p, o = f"model.layers.{i}.", f"transformer.h.{i}."
        out[o + "ln_1.weight"] = sd[p + "input_layernorm.weight"]
        out[o + "ln_2.weight"] = sd[p + "post_attention_layernorm.weight"]
        out[o + "attn.c_attn.weight"] = torch.cat(
            [
                sd[p + "self_attn.q_proj.weight"],
                sd[p + "self_attn.k_proj.weight"],
                sd[p + "self_attn.v_proj.weight"],
            ]
        )
        out[o + "attn.c_attn.bias"] = torch.cat(
            [
                sd[p + "self_attn.q_proj.bias"],
                sd[p + "self_attn.k_proj.bias"],
                sd[p + "self_attn.v_proj.bias"],
            ]
        )
        out[o + "attn.c_proj.weight"] = sd[p + "self_attn.o_proj.weight"]
        out[o + "mlp.w2.weight"] = sd[p + "mlp.gate_proj.weight"]
        out[o + "mlp.w1.weight"] = sd[p + "mlp.up_proj.weight"]
        out[o + "mlp.c_proj.weight"] = sd[p + "mlp.down_proj.weight"]
    cd = {
        "architectures": ["QWenLMHeadModel"],
        "model_type": "qwen",
        "vocab_size": VOCAB,
        "hidden_size": 64,
        "intermediate_size": 2 * 96,  # QWen reports the SUM of both halves
        "num_hidden_layers": 3,
        "num_attention_heads": 4,
        "max_position_embeddings": 256,
        "layer_norm_epsilon": 1e-5,
        "rotary_emb_base": 10000.0,
        "rope_theta": 10000.0,
        "torch_dtype": "float32",
        "eos_token_id": 2,
    }
    save_ckpt(tmp_path, cd, out)
    assert engine_greedy(tmp_path, PROMPT) == hf_greedy(m, PROMPT)


def _baichuan_ckpt(tmp_path, m, cfg, position_embedding):
    sd = m.state_dict()
    out = {
        "model.embed_tokens.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        out[p + "self_attn.W_pack.weight"] = torch.cat(
            [
                sd[p + "self_attn.q_proj.weight"],
                sd[p + "self_attn.k_proj.weight"],
                sd[p + "self_attn.v_proj.weight"],
            ]
        )
        for suf in (
            "self_attn.o_proj.weight", "input_layernorm.weight",
            "post_attention_layernorm.weight", "mlp.gate_proj.weight",
            "mlp.up_proj.weight", "mlp.down_proj.weight",
        ):
            out[p + suf] = sd[p + suf]
    cd = cfg.to_dict()
    cd["architectures"] = ["BaichuanForCausalLM"]
    cd["model_type"] = "baichuan"
    cd["position_embedding"] = position_embedding
    save_ckpt(tmp_path, cd, out)


def test_baichuan_rope(tmp_path):
    cfg, m = tiny_llama(kv_heads=4)  # baichuan is MHA
    _baichuan_ckpt(tmp_path, m, cfg, "ROPE")
    assert engine_greedy(tmp_path, PROMPT) == hf_greedy(m, PROMPT)


# ----------------------------------------------------------------------
# hand-ported oracles
# ----------------------------------------------------------------------
def manual_llama_greedy(
    cfg, sd, prompt, steps, *, alibi=False, scale_emb=1.0,
    scale_depth=None, dim_model_base=None,
):
    """Minimal float32 torch forward of the llama block math with optional
    ALiBi (no rope) and muP scalings — the parity oracle for archs without
    a transformers class (behavioral spec: reference srt/models/
    baichuan.py ALiBi path, minicpm.py scalings)."""
    H = cfg.num_attention_heads
    KV = cfg.num_key_value_heads
    D = cfg.hidden_size // H
    L = cfg.num_hidden_layers
    eps = cfg.rms_norm_eps
    rm = (
        scale_depth / math.sqrt(L) if scale_depth is not None else 1.0
    )

    def rms(x, w):
        v = x / torch.sqrt((x * x).mean(-1, keepdim=True) + eps)
        return v * w

    def rope(x, pos):
        half = D // 2
        inv = 1.0 / (
            cfg.rope_theta ** (torch.arange(0, half, dtype=torch.float32) / half)
        )
        ang = pos[:, None].float() * inv[None]
        cos = torch.cat([ang.cos(), ang.cos()], -1)
        sin = torch.cat([ang.sin(), ang.sin()], -1)
        x1, x2 = x[..., :half], x[..., half:]
        rot = torch.cat([-x2, x1], -1)
        return x * cos[:, None, :] + rot * sin[:, None, :]

    if alibi:
        from sglang_npu_tpu.models.baichuan import alibi_slopes

        slopes = torch.tensor(alibi_slopes(H))

    ids = list(prompt)
    for _ in range(steps):
        T = len(ids)
        x = sd["model.embed_tokens.weight"][torch.tensor(ids)] * scale_emb
        pos = torch.arange(T)
        for i in range(L):
            p = f"model.layers.{i}."
            h = rms(x, sd[p + "input_layernorm.weight"])
            q = (h @ sd[p + "self_attn.q_proj.weight"].T).view(T, H, D)
            k = (h @ sd[p + "self_attn.k_proj.weight"].T).view(T, KV, D)
            v = (h @ sd[p + "self_attn.v_proj.weight"].T).view(T, KV, D)
            if not alibi:
                q, k = rope(q, pos), rope(k, pos)
            g = H // KV
            k = k.repeat_interleave(g, dim=1)
            v = v.repeat_interleave(g, dim=1)
            s = torch.einsum("thd,shd->hts", q, k) / math.sqrt(D)
            if alibi:
                dist = (pos[None, :] - pos[:, None]).float()  # s - t
                s = s + slopes[:, None, None] * dist[None]
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            s = s.masked_fill(~mask[None], float("-inf"))
            a = torch.softmax(s, -1)
            o = torch.einsum("hts,shd->thd", a, v).reshape(T, -1)
            x = x + (o @ sd[p + "self_attn.o_proj.weight"].T) * rm
            h = rms(x, sd[p + "post_attention_layernorm.weight"])
            gate = h @ sd[p + "mlp.gate_proj.weight"].T
            up = h @ sd[p + "mlp.up_proj.weight"].T
            mlp = (torch.nn.functional.silu(gate) * up) @ sd[
                p + "mlp.down_proj.weight"
            ].T
            x = x + mlp * rm
        x = rms(x, sd["model.norm.weight"])
        last = x[-1]
        if dim_model_base is not None:
            last = last / (cfg.hidden_size / dim_model_base)
        head = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
        logits = last @ head.T
        ids.append(int(torch.argmax(logits)))
    return ids[len(prompt):]


def test_baichuan_alibi(tmp_path):
    cfg, m = tiny_llama(kv_heads=4)
    _baichuan_ckpt(tmp_path, m, cfg, "ALIBI")
    got = engine_greedy(tmp_path, PROMPT)
    ref = manual_llama_greedy(
        cfg, dict(m.state_dict()), PROMPT, SP["max_new_tokens"], alibi=True
    )
    assert got == ref


def test_minicpm(tmp_path):
    cfg, m = tiny_llama()
    cd = cfg.to_dict()
    cd["architectures"] = ["MiniCPMForCausalLM"]
    cd["model_type"] = "minicpm"
    cd["scale_emb"] = 4.0
    cd["scale_depth"] = 1.4
    cd["dim_model_base"] = 32
    save_ckpt(tmp_path, cd, dict(m.state_dict()))
    got = engine_greedy(tmp_path, PROMPT)
    ref = manual_llama_greedy(
        cfg, dict(m.state_dict()), PROMPT, SP["max_new_tokens"],
        scale_emb=4.0, scale_depth=1.4, dim_model_base=32,
    )
    assert got == ref


def test_internlm2_reward(tmp_path):
    cfg, m = tiny_llama()
    sd = m.state_dict()
    kv, g, d = 2, 2, 16
    out = {
        "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "v_head.weight": torch.randn(1, 64) * 0.1,
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        q = sd[p + "self_attn.q_proj.weight"].reshape(kv, g, d, 64)
        k = sd[p + "self_attn.k_proj.weight"].reshape(kv, 1, d, 64)
        v = sd[p + "self_attn.v_proj.weight"].reshape(kv, 1, d, 64)
        out[p + "attention.wqkv.weight"] = torch.cat([q, k, v], 1).reshape(-1, 64)
        out[p + "attention.wo.weight"] = sd[p + "self_attn.o_proj.weight"]
        out[p + "attention_norm.weight"] = sd[p + "input_layernorm.weight"]
        out[p + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        out[p + "feed_forward.w1.weight"] = sd[p + "mlp.gate_proj.weight"]
        out[p + "feed_forward.w3.weight"] = sd[p + "mlp.up_proj.weight"]
        out[p + "feed_forward.w2.weight"] = sd[p + "mlp.down_proj.weight"]
    cd = cfg.to_dict()
    cd["architectures"] = ["InternLM2ForRewardModel"]
    cd["model_type"] = "internlm2"
    save_ckpt(tmp_path, cd, out)
    e = Engine(
        model_path=str(tmp_path), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, is_embedding=True,
    )
    try:
        got = np.asarray(e.encode(input_ids=[PROMPT])[0]["embedding"])
    finally:
        e.shutdown()
    with torch.no_grad():
        hs = m.model(torch.tensor([PROMPT])).last_hidden_state[0, -1]
        ref = (hs @ out["v_head.weight"].T[:, 0]).item()
    # trunk exactness is covered by test_internlm2 (greedy ids match HF
    # exactly); this asserts the v_head wiring — the raw un-normalized
    # scalar accumulates fp32 order noise across the trunk (~1e-3)
    assert np.allclose(got.reshape(-1)[0], ref, rtol=5e-3, atol=5e-3), (got, ref)


# ----------------------------------------------------------------------
# ChatGLM2/3: fused qkv+bias, interleaved half rope, fused swiglu
# ----------------------------------------------------------------------
def chatglm_manual_greedy(sd, prompt, steps, *, H=4, KV=2, D=16, L=3,
                          hidden=64, eps=1e-5, theta=10000.0):
    """Hand-ported THUDM modeling_chatglm forward (behavioral spec:
    reference srt/models/chatglm.py — GPT-J interleaved rope on the first
    head_dim//2 dims, MQA, silu(x1)*x2 from the fused dense_h_to_4h)."""
    rd = D // 2

    def rms(x, w):
        v = x / torch.sqrt((x * x).mean(-1, keepdim=True) + eps)
        return v * w

    def rope(x, pos):
        half = rd // 2
        inv = 1.0 / (theta ** (torch.arange(half, dtype=torch.float32) / half))
        ang = pos[:, None].float() * inv[None]  # [T, half]
        c, s = ang.cos()[:, None, :], ang.sin()[:, None, :]
        xr, xp = x[..., :rd], x[..., rd:]
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = torch.stack([o1, o2], -1).reshape(xr.shape)
        return torch.cat([out, xp], -1)

    ids = list(prompt)
    pre = "transformer.encoder.layers."
    for _ in range(steps):
        T = len(ids)
        x = sd["transformer.embedding.word_embeddings.weight"][torch.tensor(ids)]
        pos = torch.arange(T)
        for i in range(L):
            p = f"{pre}{i}."
            h = rms(x, sd[p + "input_layernorm.weight"])
            qkv = h @ sd[p + "self_attention.query_key_value.weight"].T + sd[
                p + "self_attention.query_key_value.bias"
            ]
            q = qkv[:, : H * D].view(T, H, D)
            k = qkv[:, H * D : H * D + KV * D].view(T, KV, D)
            v = qkv[:, H * D + KV * D :].view(T, KV, D)
            q, k = rope(q, pos), rope(k, pos)
            g = H // KV
            k = k.repeat_interleave(g, dim=1)
            v = v.repeat_interleave(g, dim=1)
            s = torch.einsum("thd,shd->hts", q, k) / math.sqrt(D)
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            s = s.masked_fill(~mask[None], float("-inf"))
            o = torch.einsum("hts,shd->thd", torch.softmax(s, -1), v).reshape(T, -1)
            x = x + o @ sd[p + "self_attention.dense.weight"].T
            h = rms(x, sd[p + "post_attention_layernorm.weight"])
            h4 = h @ sd[p + "mlp.dense_h_to_4h.weight"].T
            F = h4.shape[-1] // 2
            act = torch.nn.functional.silu(h4[:, :F]) * h4[:, F:]
            x = x + act @ sd[p + "mlp.dense_4h_to_h.weight"].T
        x = rms(x, sd["transformer.encoder.final_layernorm.weight"])
        logits = x[-1] @ sd["transformer.output_layer.weight"].T
        ids.append(int(torch.argmax(logits)))
    return ids[len(prompt):]


def test_chatglm(tmp_path):
    torch.manual_seed(3)
    H, KV, D, L, hidden, F = 4, 2, 16, 3, 64, 96
    sd = {
        "transformer.embedding.word_embeddings.weight": torch.randn(VOCAB, hidden) * 0.2,
        "transformer.encoder.final_layernorm.weight": torch.rand(hidden) + 0.5,
        "transformer.output_layer.weight": torch.randn(VOCAB, hidden) * 0.2,
    }
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        sd[p + "input_layernorm.weight"] = torch.rand(hidden) + 0.5
        sd[p + "post_attention_layernorm.weight"] = torch.rand(hidden) + 0.5
        sd[p + "self_attention.query_key_value.weight"] = (
            torch.randn((H + 2 * KV) * D, hidden) * 0.1
        )
        sd[p + "self_attention.query_key_value.bias"] = (
            torch.randn((H + 2 * KV) * D) * 0.1
        )
        sd[p + "self_attention.dense.weight"] = torch.randn(hidden, H * D) * 0.1
        sd[p + "mlp.dense_h_to_4h.weight"] = torch.randn(2 * F, hidden) * 0.1
        sd[p + "mlp.dense_4h_to_h.weight"] = torch.randn(hidden, F) * 0.1
    cd = {
        "architectures": ["ChatGLMModel"],
        "model_type": "chatglm",
        "num_layers": L,
        "padded_vocab_size": VOCAB,
        "hidden_size": hidden,
        "ffn_hidden_size": F,
        "num_attention_heads": H,
        "multi_query_attention": True,
        "multi_query_group_num": KV,
        "seq_length": 256,
        "layernorm_epsilon": 1e-5,
        "rmsnorm": True,
        "add_qkv_bias": True,
        "rope_ratio": 1.0,
        "torch_dtype": "float32",
        "eos_token_id": 2,
    }
    save_ckpt(tmp_path, cd, sd)
    got = engine_greedy(tmp_path, PROMPT)
    ref = chatglm_manual_greedy(sd, PROMPT, SP["max_new_tokens"])
    assert got == ref


# ----------------------------------------------------------------------
# MoE trunks: deepseek-v1 (first-k dense + ungated shared experts) and
# xverse-moe (all-MoE, ungated shared) — hand-ported oracles
# ----------------------------------------------------------------------
def _moe_block(h, sdp, E, top_k, norm_topk, n_shared_width, router_key,
               shared_prefix):
    """softmax-topk routed experts + ungated shared experts (torch)."""
    logits = h @ sdp[router_key].T
    probs = torch.softmax(logits.float(), -1)
    w, ids = torch.topk(probs, top_k, dim=-1)
    if norm_topk:
        w = w / w.sum(-1, keepdim=True)
    out = torch.zeros_like(h)
    for t in range(h.shape[0]):
        for j in range(top_k):
            e = int(ids[t, j])
            g = h[t] @ sdp[f"mlp.experts.{e}.gate_proj.weight"].T
            u = h[t] @ sdp[f"mlp.experts.{e}.up_proj.weight"].T
            out[t] += w[t, j] * (
                (torch.nn.functional.silu(g) * u)
                @ sdp[f"mlp.experts.{e}.down_proj.weight"].T
            )
    if n_shared_width:
        g = h @ sdp[shared_prefix + "gate_proj.weight"].T
        u = h @ sdp[shared_prefix + "up_proj.weight"].T
        out = out + (torch.nn.functional.silu(g) * u) @ sdp[
            shared_prefix + "down_proj.weight"
        ].T
    return out


def _moe_manual_greedy(sd, prompt, steps, *, L, H, KV, D, hidden, eps,
                       theta, is_moe, E, top_k, norm_topk, shared_w,
                       router_key="mlp.gate.weight"):
    def rms(x, w):
        v = x / torch.sqrt((x * x).mean(-1, keepdim=True) + eps)
        return v * w

    def rope(x, pos):
        half = D // 2
        inv = 1.0 / (theta ** (torch.arange(half, dtype=torch.float32) / half))
        ang = pos[:, None].float() * inv[None]
        cos = torch.cat([ang.cos(), ang.cos()], -1)[:, None, :]
        sin = torch.cat([ang.sin(), ang.sin()], -1)[:, None, :]
        x1, x2 = x[..., : half], x[..., half:]
        rot = torch.cat([-x2, x1], -1)
        return x * cos + rot * sin

    ids_ = list(prompt)
    for _ in range(steps):
        T = len(ids_)
        x = sd["model.embed_tokens.weight"][torch.tensor(ids_)]
        pos = torch.arange(T)
        for i in range(L):
            p = f"model.layers.{i}."
            sdp = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
            h = rms(x, sdp["input_layernorm.weight"])
            q = (h @ sdp["self_attn.q_proj.weight"].T).view(T, H, D)
            k = (h @ sdp["self_attn.k_proj.weight"].T).view(T, KV, D)
            v = (h @ sdp["self_attn.v_proj.weight"].T).view(T, KV, D)
            q, k = rope(q, pos), rope(k, pos)
            g = H // KV
            k = k.repeat_interleave(g, 1)
            v = v.repeat_interleave(g, 1)
            s = torch.einsum("thd,shd->hts", q, k) / math.sqrt(D)
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            s = s.masked_fill(~mask[None], float("-inf"))
            o = torch.einsum("hts,shd->thd", torch.softmax(s, -1), v).reshape(T, -1)
            x = x + o @ sdp["self_attn.o_proj.weight"].T
            h = rms(x, sdp["post_attention_layernorm.weight"])
            if is_moe(i):
                x = x + _moe_block(
                    h, sdp, E, top_k, norm_topk, shared_w, router_key,
                    "mlp.shared_experts.",
                )
            else:
                gt = h @ sdp["mlp.gate_proj.weight"].T
                up = h @ sdp["mlp.up_proj.weight"].T
                x = x + (torch.nn.functional.silu(gt) * up) @ sdp[
                    "mlp.down_proj.weight"
                ].T
        x = rms(x, sd["model.norm.weight"])
        logits = x[-1] @ sd["lm_head.weight"].T
        ids_.append(int(torch.argmax(logits)))
    return ids_[len(prompt):]


def _mk_moe_sd(L, H, KV, D, hidden, F_dense, E, Fm, shared_n, is_moe,
               router_key="mlp.gate.weight"):
    torch.manual_seed(11)
    sd = {
        "model.embed_tokens.weight": torch.randn(VOCAB, hidden) * 0.2,
        "model.norm.weight": torch.rand(hidden) + 0.5,
        "lm_head.weight": torch.randn(VOCAB, hidden) * 0.2,
    }
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = torch.rand(hidden) + 0.5
        sd[p + "post_attention_layernorm.weight"] = torch.rand(hidden) + 0.5
        sd[p + "self_attn.q_proj.weight"] = torch.randn(H * D, hidden) * 0.1
        sd[p + "self_attn.k_proj.weight"] = torch.randn(KV * D, hidden) * 0.1
        sd[p + "self_attn.v_proj.weight"] = torch.randn(KV * D, hidden) * 0.1
        sd[p + "self_attn.o_proj.weight"] = torch.randn(hidden, H * D) * 0.1
        if is_moe(i):
            sd[p + router_key] = torch.randn(E, hidden) * 0.5
            for e in range(E):
                sd[p + f"mlp.experts.{e}.gate_proj.weight"] = torch.randn(Fm, hidden) * 0.1
                sd[p + f"mlp.experts.{e}.up_proj.weight"] = torch.randn(Fm, hidden) * 0.1
                sd[p + f"mlp.experts.{e}.down_proj.weight"] = torch.randn(hidden, Fm) * 0.1
            if shared_n:
                Fs = Fm * shared_n
                sd[p + "mlp.shared_experts.gate_proj.weight"] = torch.randn(Fs, hidden) * 0.1
                sd[p + "mlp.shared_experts.up_proj.weight"] = torch.randn(Fs, hidden) * 0.1
                sd[p + "mlp.shared_experts.down_proj.weight"] = torch.randn(hidden, Fs) * 0.1
        else:
            sd[p + "mlp.gate_proj.weight"] = torch.randn(F_dense, hidden) * 0.1
            sd[p + "mlp.up_proj.weight"] = torch.randn(F_dense, hidden) * 0.1
            sd[p + "mlp.down_proj.weight"] = torch.randn(hidden, F_dense) * 0.1
    return sd


def test_deepseek_v1_moe(tmp_path):
    L, H, KV, D, hidden = 3, 4, 2, 16, 64
    E, Fm, shared_n, F_dense = 4, 32, 2, 96
    is_moe = lambda i: i >= 1
    sd = _mk_moe_sd(L, H, KV, D, hidden, F_dense, E, Fm, shared_n, is_moe)
    cd = {
        "architectures": ["DeepseekForCausalLM"],
        "model_type": "deepseek",
        "vocab_size": VOCAB, "hidden_size": hidden,
        "intermediate_size": F_dense, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "torch_dtype": "float32",
        "eos_token_id": 2,
        "n_routed_experts": E, "num_experts_per_tok": 2,
        "moe_intermediate_size": Fm, "n_shared_experts": shared_n,
        "first_k_dense_replace": 1, "moe_layer_freq": 1,
        "norm_topk_prob": False,
    }
    save_ckpt(tmp_path, cd, sd)
    got = engine_greedy(tmp_path, PROMPT)
    ref = _moe_manual_greedy(
        sd, PROMPT, SP["max_new_tokens"], L=L, H=H, KV=KV, D=D,
        hidden=hidden, eps=1e-5, theta=10000.0, is_moe=is_moe, E=E,
        top_k=2, norm_topk=False, shared_w=Fm * shared_n,
    )
    assert got == ref


def test_xverse_moe(tmp_path):
    L, H, KV, D, hidden = 3, 4, 2, 16, 64
    E, Fm, shared_n = 4, 32, 2
    is_moe = lambda i: True
    sd = _mk_moe_sd(
        L, H, KV, D, hidden, 0, E, Fm, shared_n, is_moe,
        router_key="mlp.router.weight",
    )
    cd = {
        "architectures": ["XverseMoeForCausalLM"],
        "model_type": "xverse",
        "vocab_size": VOCAB, "hidden_size": hidden,
        "intermediate_size": Fm, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "torch_dtype": "float32",
        "eos_token_id": 2,
        "num_experts": E, "moe_top_k": 2, "num_shared_experts": shared_n,
        "norm_topk_prob": False,
    }
    save_ckpt(tmp_path, cd, sd)
    got = engine_greedy(tmp_path, PROMPT)
    ref = _moe_manual_greedy(
        sd, PROMPT, SP["max_new_tokens"], L=L, H=H, KV=KV, D=D,
        hidden=hidden, eps=1e-5, theta=10000.0, is_moe=is_moe, E=E,
        top_k=2, norm_topk=False, shared_w=Fm * shared_n,
        router_key="mlp.router.weight",
    )
    assert got == ref


# ----------------------------------------------------------------------
# Grok-1: sandwich norms, softcapped attn + router, gelu MoE, multipliers
# ----------------------------------------------------------------------
def grok_manual_greedy(sd, prompt, steps, *, L=2, H=4, KV=2, D=16,
                       hidden=64, E=4, top_k=2, Fm=32, eps=1e-5,
                       theta=10000.0, emb_scale=2.0, out_scale=0.5,
                       cap=30.0):
    def rms(x, w):
        v = x / torch.sqrt((x * x).mean(-1, keepdim=True) + eps)
        return v * w

    def rope(x, pos):
        half = D // 2
        inv = 1.0 / (theta ** (torch.arange(half, dtype=torch.float32) / half))
        ang = pos[:, None].float() * inv[None]
        cos = torch.cat([ang.cos(), ang.cos()], -1)[:, None, :]
        sin = torch.cat([ang.sin(), ang.sin()], -1)[:, None, :]
        x1, x2 = x[..., :half], x[..., half:]
        return x * cos + torch.cat([-x2, x1], -1) * sin

    ids = list(prompt)
    for _ in range(steps):
        T = len(ids)
        x = sd["model.embed_tokens.weight"][torch.tensor(ids)] * emb_scale
        pos = torch.arange(T)
        for i in range(L):
            p = f"model.layers.{i}."
            h = rms(x, sd[p + "pre_attn_norm.weight"])
            q = (h @ sd[p + "self_attn.q_proj.weight"].T).view(T, H, D)
            k = (h @ sd[p + "self_attn.k_proj.weight"].T).view(T, KV, D)
            v = (h @ sd[p + "self_attn.v_proj.weight"].T).view(T, KV, D)
            q, k = rope(q, pos), rope(k, pos)
            g = H // KV
            k = k.repeat_interleave(g, 1)
            v = v.repeat_interleave(g, 1)
            s = torch.einsum("thd,shd->hts", q, k) / math.sqrt(D)
            s = cap * torch.tanh(s / cap)
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            s = s.masked_fill(~mask[None], float("-inf"))
            o = torch.einsum("hts,shd->thd", torch.softmax(s, -1), v).reshape(T, -1)
            att_out = o @ sd[p + "self_attn.o_proj.weight"].T
            x = x + rms(att_out, sd[p + "post_attn_norm.weight"])

            h2 = rms(x, sd[p + "pre_moe_norm.weight"])
            logits = h2 @ sd[p + "block_sparse_moe.gate.weight"].T
            logits = cap * torch.tanh(logits.float() / cap)
            probs = torch.softmax(logits, -1)
            w, e_ids = torch.topk(probs, top_k, dim=-1)  # NO renormalize
            moe = torch.zeros_like(h2)
            for t in range(T):
                for j in range(top_k):
                    e = int(e_ids[t, j])
                    gg = h2[t] @ sd[p + f"block_sparse_moe.experts.{e}.w1.weight"].T
                    uu = h2[t] @ sd[p + f"block_sparse_moe.experts.{e}.w3.weight"].T
                    moe[t] += w[t, j] * (
                        (torch.nn.functional.gelu(gg, approximate="none") * uu)
                        @ sd[p + f"block_sparse_moe.experts.{e}.w2.weight"].T
                    )
            x = x + rms(moe, sd[p + "post_moe_norm.weight"])
        x = rms(x, sd["model.norm.weight"])
        logits = (x[-1] @ sd["lm_head.weight"].T) * out_scale
        ids.append(int(torch.argmax(logits)))
    return ids[len(prompt):]


def test_grok1(tmp_path):
    torch.manual_seed(21)
    L, H, KV, D, hidden, E, Fm = 2, 4, 2, 16, 64, 4, 32
    sd = {
        "model.embed_tokens.weight": torch.randn(VOCAB, hidden) * 0.2,
        "model.norm.weight": torch.rand(hidden) + 0.5,
        "lm_head.weight": torch.randn(VOCAB, hidden) * 0.2,
    }
    for i in range(L):
        p = f"model.layers.{i}."
        for nm in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                   "post_moe_norm"):
            sd[p + nm + ".weight"] = torch.rand(hidden) + 0.5
        sd[p + "self_attn.q_proj.weight"] = torch.randn(H * D, hidden) * 0.1
        sd[p + "self_attn.k_proj.weight"] = torch.randn(KV * D, hidden) * 0.1
        sd[p + "self_attn.v_proj.weight"] = torch.randn(KV * D, hidden) * 0.1
        sd[p + "self_attn.o_proj.weight"] = torch.randn(hidden, H * D) * 0.1
        sd[p + "block_sparse_moe.gate.weight"] = torch.randn(E, hidden) * 0.5
        for e in range(E):
            sd[p + f"block_sparse_moe.experts.{e}.w1.weight"] = torch.randn(Fm, hidden) * 0.1
            sd[p + f"block_sparse_moe.experts.{e}.w3.weight"] = torch.randn(Fm, hidden) * 0.1
            sd[p + f"block_sparse_moe.experts.{e}.w2.weight"] = torch.randn(hidden, Fm) * 0.1
    cd = {
        "architectures": ["Grok1ForCausalLM"],
        "model_type": "grok-1",
        "vocab_size": VOCAB, "hidden_size": hidden,
        "intermediate_size": Fm, "moe_intermediate_size": Fm,
        "num_hidden_layers": L, "num_attention_heads": H,
        "num_key_value_heads": KV, "head_dim": D,
        "num_local_experts": E, "num_experts_per_tok": 2,
        "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "torch_dtype": "float32",
        "eos_token_id": 2,
        "embedding_multiplier_scale": 2.0,
        "output_multiplier_scale": 0.5,
        "attn_logit_softcapping": 30.0,
        "router_logit_softcapping": 30.0,
    }
    save_ckpt(tmp_path, cd, sd)
    got = engine_greedy(tmp_path, PROMPT)
    ref = grok_manual_greedy(sd, PROMPT, SP["max_new_tokens"])
    assert got == ref
