"""Kimi-VL parity: MoonViT (2D rope, packed patches, patch merger,
QuickGELU projector) over the DeepSeek-V2 MLA trunk.

Remote-code on HF, so the oracle is a hand-ported torch MoonViT
(behavioral spec: reference `srt/models/kimi_vl_moonvit.py`) feeding a
transformers DeepseekV2ForCausalLM via inputs_embeds.  The test grid
equals the learned pos-emb grid so no interpolation kernel differences
enter the comparison."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
st = pytest.importorskip("safetensors.torch")
from PIL import Image

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_npu_tpu.sampling.sampling_params import SamplingParams

VOCAB = 128
IMG_TOKEN = 121
PS, HV, VHEADS, VLAYERS, VF = 4, 16, 2, 2, 32
HD = HV // VHEADS  # 8
PE = 4  # pos emb grid 4x4
DT = 64

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
    torch.manual_seed(11)
    sd = {
        "vision_tower.patch_embed.proj.weight": torch.randn(HV, 3, PS, PS) * 0.05,
        "vision_tower.patch_embed.proj.bias": torch.randn(HV) * 0.05,
        "vision_tower.patch_embed.pos_emb.weight": torch.randn(PE, PE, HV) * 0.05,
        "vision_tower.encoder.final_layernorm.weight": torch.rand(HV) + 0.5,
        "vision_tower.encoder.final_layernorm.bias": torch.randn(HV) * 0.05,
        "multi_modal_projector.pre_norm.weight": torch.rand(HV) + 0.5,
        "multi_modal_projector.pre_norm.bias": torch.randn(HV) * 0.05,
        "multi_modal_projector.linear_1.weight": torch.randn(4 * HV, 4 * HV) * 0.05,
        "multi_modal_projector.linear_1.bias": torch.randn(4 * HV) * 0.05,
        "multi_modal_projector.linear_2.weight": torch.randn(DT, 4 * HV) * 0.05,
        "multi_modal_projector.linear_2.bias": torch.randn(DT) * 0.05,
    }
    for i in range(VLAYERS):
        p = f"vision_tower.encoder.blocks.{i}."
        sd[p + "norm0.weight"] = torch.rand(HV) + 0.5
        sd[p + "norm0.bias"] = torch.randn(HV) * 0.05
        sd[p + "wqkv.weight"] = torch.randn(3 * HV, HV) * 0.05
        sd[p + "wqkv.bias"] = torch.randn(3 * HV) * 0.05
        sd[p + "wo.weight"] = torch.randn(HV, HV) * 0.05
        sd[p + "wo.bias"] = torch.randn(HV) * 0.05
        sd[p + "norm1.weight"] = torch.rand(HV) + 0.5
        sd[p + "norm1.bias"] = torch.randn(HV) * 0.05
        sd[p + "mlp.fc0.weight"] = torch.randn(VF, HV) * 0.05
        sd[p + "mlp.fc0.bias"] = torch.randn(VF) * 0.05
        sd[p + "mlp.fc1.weight"] = torch.randn(HV, VF) * 0.05
        sd[p + "mlp.fc1.bias"] = torch.randn(HV) * 0.05
    return sd


def torch_moonvit(sd, packs, h, w):
    """Hand-ported MoonViT + merger + projector: [T, 3*ps^2] -> [T/4, DT]."""
    T = h * w
    x = torch.tensor(packs)
    wpe = sd["vision_tower.patch_embed.proj.weight"].reshape(HV, -1)
    x = x @ wpe.T + sd["vision_tower.patch_embed.proj.bias"]
    x = x + sd["vision_tower.patch_embed.pos_emb.weight"].reshape(-1, HV)
    # 2D rope cis: interleaved x/y pairs
    ys, xs = np.divmod(np.arange(T), w)
    freqs = 1.0 / (10000.0 ** (np.arange(0, HD, 4)[: HD // 4] / HD))
    xa = np.outer(xs, freqs)
    ya = np.outer(ys, freqs)
    ang = torch.tensor(
        np.stack([xa, ya], -1).reshape(T, HD // 2).astype(np.float32)
    )
    cis = torch.polar(torch.ones_like(ang), ang)  # [T, HD/2] complex

    ln = torch.nn.functional.layer_norm
    for i in range(VLAYERS):
        p = f"vision_tower.encoder.blocks.{i}."
        hdn = ln(x, (HV,), sd[p + "norm0.weight"], sd[p + "norm0.bias"])
        qkv = (hdn @ sd[p + "wqkv.weight"].T + sd[p + "wqkv.bias"]).reshape(
            T, 3, VHEADS, HD
        )
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]

        def rope(t):
            tc = torch.view_as_complex(
                t.float().reshape(T, VHEADS, HD // 2, 2)
            )
            return torch.view_as_real(tc * cis[:, None, :]).reshape(
                T, VHEADS, HD
            )

        q, k = rope(q), rope(k)
        s = torch.einsum("qhd,khd->hqk", q, k) / math.sqrt(HD)
        o = torch.einsum(
            "hqk,khd->qhd", torch.softmax(s, -1), v.float()
        ).reshape(T, HV)
        x = x + o @ sd[p + "wo.weight"].T + sd[p + "wo.bias"]
        h2 = ln(x, (HV,), sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        m = torch.nn.functional.gelu(
            h2 @ sd[p + "mlp.fc0.weight"].T + sd[p + "mlp.fc0.bias"]
        )
        x = x + m @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"]
    x = ln(
        x, (HV,),
        sd["vision_tower.encoder.final_layernorm.weight"],
        sd["vision_tower.encoder.final_layernorm.bias"],
    )
    # 2x2 merger
    x = x.reshape(h // 2, 2, w // 2, 2, HV).permute(0, 2, 1, 3, 4)
    x = x.reshape(-1, 4, HV)
    x = ln(
        x, (HV,),
        sd["multi_modal_projector.pre_norm.weight"],
        sd["multi_modal_projector.pre_norm.bias"],
    ).reshape(-1, 4 * HV)
    x = x @ sd["multi_modal_projector.linear_1.weight"].T + sd[
        "multi_modal_projector.linear_1.bias"
    ]
    x = x * torch.sigmoid(1.702 * x)  # QuickGELU
    return x @ sd["multi_modal_projector.linear_2.weight"].T + sd[
        "multi_modal_projector.linear_2.bias"
    ]


def test_kimi_vl_parity(tmp_path):
    cfg = lm_config()
    torch.manual_seed(3)
    lm = transformers.DeepseekV2ForCausalLM(cfg)
    lm.eval()
    vsd = make_vision_sd()
    sd = {("language_model." + k): v for k, v in lm.state_dict().items()}
    sd.update(vsd)
    cd = {
        "architectures": ["KimiVLForConditionalGeneration"],
        "model_type": "kimi_vl",
        "text_config": cfg.to_dict(),
        "vision_config": {
            "patch_size": PS, "hidden_size": HV,
            "num_attention_heads": VHEADS, "num_hidden_layers": VLAYERS,
            "intermediate_size": VF, "init_pos_emb_height": PE,
            "init_pos_emb_width": PE, "merge_kernel_size": [2, 2],
        },
        "media_placeholder_token_id": IMG_TOKEN,
        "torch_dtype": "float32",
        "eos_token_id": 2,
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cd, f, default=str)
    st.save_file(
        {k: v.contiguous() for k, v in sd.items()},
        str(tmp_path / "model.safetensors"),
    )

    rng = np.random.default_rng(8)
    img = Image.fromarray(
        rng.integers(0, 255, size=(PE * PS, PE * PS, 3), dtype=np.uint8)
    )
    from sglang_npu_tpu.multimodal.processor import _process_kimi_vl

    base_ids = list(rng.integers(3, 100, size=5)) + [IMG_TOKEN] + list(
        rng.integers(3, 100, size=4)
    )
    mm = _process_kimi_vl(None, base_ids, [img], cd)
    assert list(mm["image_grid_hws"][0]) == [PE, PE]
    n_img = (PE // 2) ** 2
    assert sum(1 for t in mm["input_ids"] if t == IMG_TOKEN) == n_img

    e = Engine(
        model_path=str(tmp_path), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        t = TokenizedGenerateReqInput(
            rid="kimivl", input_text=None, input_ids=mm["input_ids"],
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

    with torch.no_grad():
        embeds = torch_moonvit(vsd, mm["pixel_values"], PE, PE)
        ids = list(mm["input_ids"])
        for _ in range(6):
            emb = lm.model.embed_tokens(torch.tensor(ids))
            pos = [i for i, tk in enumerate(ids) if tk == IMG_TOKEN]
            emb[pos] = embeds.to(emb.dtype)
            out = lm(inputs_embeds=emb[None]).logits[0, -1]
            ids.append(int(torch.argmax(out)))
    ref = ids[len(mm["input_ids"]):]
    assert got == ref, (got, ref)
