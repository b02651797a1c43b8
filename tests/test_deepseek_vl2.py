"""DeepSeek-VL2 parity: SigLIP tower + downsample projector + global/
local tile layout over the DeepSeek-V2 MLA trunk.

The HF checkpoint is remote-code, so the oracle is hand-ported torch
(vision tower + projector + tile assembly per the behavioral spec,
reference `srt/models/deepseek_vl2.py` / `srt/configs/deepseekvl2.py`)
feeding a transformers DeepseekV2ForCausalLM via inputs_embeds."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
st = pytest.importorskip("safetensors.torch")
PIL = pytest.importorskip("PIL")
from PIL import Image

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_npu_tpu.sampling.sampling_params import SamplingParams

VOCAB = 128
IMG_TOKEN = 120
S, PATCH, DOWN = 32, 8, 2
HV, VHEADS, VLAYERS, VF = 32, 2, 2, 64
DT = 64  # text hidden
G = S // PATCH  # 4
HW = (G // DOWN) ** 2  # 4 tokens per tile
TOKS = G // DOWN  # h = w = 2

pytestmark = pytest.mark.fast


def lm_config():
    return transformers.DeepseekV2Config(
        vocab_size=VOCAB, hidden_size=DT, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, moe_intermediate_size=32,
        num_experts_per_tok=2, moe_layer_freq=1, first_k_dense_replace=2,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=256,
        tie_word_embeddings=False, torch_dtype="float32", eos_token_id=2,
        rope_scaling=None, attention_bias=False,
    )


def make_vision_sd():
    torch.manual_seed(7)
    sd = {
        "vision.patch_embed.proj.weight": torch.randn(HV, 3, PATCH, PATCH) * 0.05,
        "vision.patch_embed.proj.bias": torch.randn(HV) * 0.05,
        "vision.pos_embed": torch.randn(1, G * G, HV) * 0.05,
        "vision.norm.weight": torch.rand(HV) + 0.5,
        "vision.norm.bias": torch.randn(HV) * 0.05,
        "projector.layers.0.weight": torch.randn(DT, HV * DOWN * DOWN) * 0.05,
        "projector.layers.0.bias": torch.randn(DT) * 0.05,
        "projector.layers.2.weight": torch.randn(DT, DT) * 0.05,
        "projector.layers.2.bias": torch.randn(DT) * 0.05,
        "image_newline": torch.randn(DT) * 0.05,
        "view_seperator": torch.randn(DT) * 0.05,
    }
    for i in range(VLAYERS):
        p = f"vision.blocks.{i}."
        sd[p + "norm1.weight"] = torch.rand(HV) + 0.5
        sd[p + "norm1.bias"] = torch.randn(HV) * 0.05
        sd[p + "attn.qkv.weight"] = torch.randn(3 * HV, HV) * 0.05
        sd[p + "attn.qkv.bias"] = torch.randn(3 * HV) * 0.05
        sd[p + "attn.proj.weight"] = torch.randn(HV, HV) * 0.05
        sd[p + "attn.proj.bias"] = torch.randn(HV) * 0.05
        sd[p + "norm2.weight"] = torch.rand(HV) + 0.5
        sd[p + "norm2.bias"] = torch.randn(HV) * 0.05
        sd[p + "mlp.fc1.weight"] = torch.randn(VF, HV) * 0.05
        sd[p + "mlp.fc1.bias"] = torch.randn(VF) * 0.05
        sd[p + "mlp.fc2.weight"] = torch.randn(HV, VF) * 0.05
        sd[p + "mlp.fc2.bias"] = torch.randn(HV) * 0.05
    return sd


def torch_vision(sd, pixels):
    """Hand-ported SigLIP forward_features + downsample projector."""
    x = torch.tensor(pixels)  # [N, 3, S, S]
    N = x.shape[0]
    w = sd["vision.patch_embed.proj.weight"].reshape(HV, -1)
    x = (
        x.reshape(N, 3, G, PATCH, G, PATCH)
        .permute(0, 2, 4, 1, 3, 5)
        .reshape(N, G * G, 3 * PATCH * PATCH)
    )
    x = x @ w.T + sd["vision.patch_embed.proj.bias"]
    x = x + sd["vision.pos_embed"]
    ln = torch.nn.functional.layer_norm
    for i in range(VLAYERS):
        p = f"vision.blocks.{i}."
        h = ln(x, (HV,), sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        qkv = h @ sd[p + "attn.qkv.weight"].T + sd[p + "attn.qkv.bias"]
        q, k, v = qkv.chunk(3, -1)
        hd = HV // VHEADS
        q = q.reshape(N, -1, VHEADS, hd)
        k = k.reshape(N, -1, VHEADS, hd)
        v = v.reshape(N, -1, VHEADS, hd)
        s = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        o = torch.einsum(
            "bhqk,bkhd->bqhd", torch.softmax(s, -1), v
        ).reshape(N, -1, HV)
        x = x + o @ sd[p + "attn.proj.weight"].T + sd[p + "attn.proj.bias"]
        h2 = ln(x, (HV,), sd[p + "norm2.weight"], sd[p + "norm2.bias"])
        m = torch.nn.functional.gelu(
            h2 @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"]
        )
        x = x + m @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
    x = ln(x, (HV,), sd["vision.norm.weight"], sd["vision.norm.bias"])
    # channel-major 2x2 unfold (F.unfold order), then mlp
    x = x.reshape(N, G, G, HV).permute(0, 3, 1, 2)
    x = torch.nn.functional.unfold(x, DOWN, stride=DOWN).permute(0, 2, 1)
    x = torch.nn.functional.gelu(
        x @ sd["projector.layers.0.weight"].T + sd["projector.layers.0.bias"]
    )
    return x @ sd["projector.layers.2.weight"].T + sd["projector.layers.2.bias"]


def assemble(sd, embeds, wi, hi):
    h = w = TOKS
    nl = sd["image_newline"]
    sep = sd["view_seperator"]
    g = embeds[0].reshape(h, w, -1)
    g = torch.cat([g, nl.expand(h, 1, -1)], dim=1).reshape(-1, DT)
    loc = embeds[1 : 1 + wi * hi]
    loc = loc.reshape(hi, wi, h, w, -1).permute(0, 2, 1, 3, 4)
    loc = loc.reshape(hi * h, wi * w, -1)
    loc = torch.cat([loc, nl.expand(hi * h, 1, -1)], dim=1).reshape(-1, DT)
    return torch.cat([g, sep[None], loc], dim=0)


def test_deepseek_vl2_parity(tmp_path):
    cfg = lm_config()
    torch.manual_seed(1)
    lm = transformers.DeepseekV2ForCausalLM(cfg)
    lm.eval()
    vsd = make_vision_sd()
    sd = {("language." + k): v for k, v in lm.state_dict().items()}
    sd.update(vsd)
    cd = {
        "architectures": ["DeepseekVL2ForCausalLM"],
        "model_type": "deepseek_vl_v2",
        "language_config": cfg.to_dict(),
        "vision_config": {
            "image_size": S, "patch_size": PATCH, "width": HV,
            "layers": VLAYERS, "heads": VHEADS, "intermediate_size": VF,
            "layer_norm_eps": 1e-6,
        },
        "projector_config": {
            "projector_type": "downsample_mlp_gelu", "input_dim": HV,
            "n_embed": DT, "depth": 2, "mlp_ratio": 1,
            "downsample_ratio": DOWN,
        },
        "candidate_resolutions": [[32, 32], [64, 32]],
        "image_token_id": IMG_TOKEN,
        "tile_tag": "2D", "global_view_pos": "head",
        "torch_dtype": "float32",
        "eos_token_id": 2,
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cd, f, default=str)
    st.save_file(
        {k: v.contiguous() for k, v in sd.items()},
        str(tmp_path / "model.safetensors"),
    )

    # a 48x32 image -> best candidate (64, 32): 2x1 local tiles
    rng = np.random.default_rng(5)
    img = Image.fromarray(
        rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
    )
    from sglang_npu_tpu.multimodal.processor import _process_deepseek_vl2

    base_ids = list(rng.integers(3, 100, size=5)) + [IMG_TOKEN] + list(
        rng.integers(3, 100, size=4)
    )
    mm = _process_deepseek_vl2(None, None, base_ids, [img], cd)
    wi, hi = mm["images_spatial_crop"][0]
    assert (wi, hi) == (2, 1)
    n_img_tokens = TOKS * (TOKS + 1) + 1 + (hi * TOKS) * (wi * TOKS + 1)
    assert sum(1 for t in mm["input_ids"] if t == IMG_TOKEN) == n_img_tokens

    # engine generation
    e = Engine(
        model_path=str(tmp_path), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        t = TokenizedGenerateReqInput(
            rid="vl2", input_text=None, input_ids=mm["input_ids"],
            sampling_params=SamplingParams.from_dict(
                {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
            ),
            mm_inputs=mm,
        )
        state = e.tokenizer_manager.submit(t)
        while True:
            chunk, finished = state.mailbox.get(timeout=300)
            if finished:
                got = chunk["output_ids"][:6]
                break
    finally:
        e.shutdown()

    # torch oracle
    with torch.no_grad():
        tiles = torch_vision(vsd, mm["pixel_values"])
        img_embeds = assemble(vsd, tiles, int(wi), int(hi))
        ids = list(mm["input_ids"])
        for _ in range(6):
            emb = lm.model.embed_tokens(torch.tensor(ids))
            pos = [i for i, t in enumerate(ids) if t == IMG_TOKEN]
            emb[pos] = img_embeds.to(emb.dtype)
            out = lm(inputs_embeds=emb[None]).logits[0, -1]
            ids.append(int(torch.argmax(out)))
    ref = ids[len(mm["input_ids"]):]
    assert got == ref, (got, ref)
