"""Classification / reward-model heads vs HF (last-token pooling, raw
logits; reference llama_classification / qwen2_classification /
qwen2_rm)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
safetensors = pytest.importorskip("safetensors")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def _tiny_cfg(cls, **kw):
    return cls(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=2, pad_token_id=0, **kw,
    )


def test_llama_seq_classification(tmp_path_factory):
    cfg = _tiny_cfg(transformers.LlamaConfig, num_labels=3)
    torch.manual_seed(0)
    hf = transformers.LlamaForSequenceClassification(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("llama_cls")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, is_embedding=True,
    )
    try:
        rng = np.random.default_rng(6)
        p = rng.integers(3, VOCAB, size=9).tolist()
        out = e.encode(input_ids=[p])
        got = np.asarray(out[0]["embedding"], np.float32)
        assert got.shape == (3,)
        with torch.no_grad():
            ref = hf(torch.tensor([p])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    finally:
        e.shutdown()


def test_qwen2_reward_model(tmp_path_factory):
    """Qwen2ForRewardModel: Linear->ReLU->Linear head over the last
    hidden state (score.0 / score.2 checkpoint names)."""
    cfg = _tiny_cfg(transformers.Qwen2Config)
    cfg.architectures = ["Qwen2ForRewardModel"]
    torch.manual_seed(0)
    trunk = transformers.Qwen2ForCausalLM(cfg)
    trunk.eval()
    head = torch.nn.Sequential(
        torch.nn.Linear(64, 64), torch.nn.ReLU(), torch.nn.Linear(64, 1)
    )
    d = tmp_path_factory.mktemp("qwen2_rm")
    trunk.save_pretrained(d, safe_serialization=True)
    # append the reward head tensors the way RM checkpoints ship them
    from safetensors.torch import load_file, save_file

    f = d / "model.safetensors"
    tensors = load_file(str(f))
    tensors.pop("lm_head.weight", None)
    tensors["score.0.weight"] = head[0].weight.detach().clone()
    tensors["score.0.bias"] = head[0].bias.detach().clone()
    tensors["score.2.weight"] = head[2].weight.detach().clone()
    tensors["score.2.bias"] = head[2].bias.detach().clone()
    save_file(tensors, str(f))
    import json

    cfg_path = d / "config.json"
    cj = json.loads(cfg_path.read_text())
    cj["architectures"] = ["Qwen2ForRewardModel"]
    cfg_path.write_text(json.dumps(cj))

    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, is_embedding=True,
    )
    try:
        rng = np.random.default_rng(7)
        p = rng.integers(3, VOCAB, size=11).tolist()
        out = e.encode(input_ids=[p])
        got = np.asarray(out[0]["embedding"], np.float32)
        assert got.shape == (1,)
        with torch.no_grad():
            hidden = trunk.model(torch.tensor([p])).last_hidden_state[0, -1]
            ref = head(hidden).numpy()
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    finally:
        e.shutdown()
