"""DeepSeek NextN (MTP) speculative draft head.

Counterpart of the reference's `srt/models/deepseek_nextn.py`
(`DeepseekModelNextN`): one extra DeepSeek decoder layer whose input is
eh_proj(concat(enorm(embed(token)), hnorm(previous_target_hidden))) and
whose output passes shared_head.norm before reusing the target lm_head.

Plugged into the EAGLE runner (`model_executor/eagle_runner.py`) as a
drop-in draft model: same `forward(params, embed, pool, fb, ps, prev_h)`
interface as `EagleDraftModel`, but with MLA attention over a 1-layer
latent draft pool (same page/slot ids as the target latent pool).

HF checkpoint layout (reference `deepseek_v2.py:load_weights`
`is_nextn=True` branch): all weights under `model.layers.{N}.` where
N = num_hidden_layers for in-checkpoint MTP weights, or 0 for a
standalone extracted draft (config has num_hidden_layers == 1);
`enorm/hnorm/eh_proj/shared_head.norm` live beside the usual decoder
tensors.  embed/lm_head come from the target (shared)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import rms_norm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM, _lk
from sglang_npu_tpu.ops.mla_attention import (
    KPE_PAD,
    MLALatentPool,
    mla_attention_xla,
    write_latent,
)


class DeepseekNextNModel(DeepseekV2ForCausalLM):
    """Functional MTP draft: enorm/hnorm/eh_proj + one MLA decoder layer
    + shared_head.norm.  The pytree does NOT include embed/lm_head — the
    caller passes the target's (reference shares them,
    `deepseek_nextn.py:load_weights` skips `shared_head.head` and
    `embed_tokens`)."""

    def _is_moe(self, i: int) -> bool:
        # the NextN layer is sparse whenever the model has routed experts
        # (reference `_is_layer_sparse(layer_id, is_nextn=True)`)
        return self.n_experts > 0

    def _nextn_layer_id(self) -> int:
        # standalone extracted drafts set num_hidden_layers == 1 and keep
        # the weights at layer 0; in-checkpoint MTP weights live at index
        # num_hidden_layers (reference `load_weights` nextn branch)
        n = self.config.num_hidden_layers
        return 0 if n == 1 else n

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        full = super().param_shapes()
        c = self.config
        D = c.hidden_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        return {
            "enorm": ((D,), jnp.float32),
            "hnorm": ((D,), jnp.float32),
            "eh_proj": ((2 * D, D), dt),
            "shared_norm": ((D,), jnp.float32),
            "mtp": full[_lk(0)],
        }

    def param_shardings(self) -> Dict[str, Any]:
        full = super().param_shardings()
        return {
            "enorm": P(None),
            "hnorm": P(None),
            "eh_proj": P(None, None),
            "shared_norm": P(None),
            "mtp": full[_lk(0)],
        }

    def hf_weight_map(self):
        full, _ = super().hf_weight_map()
        nid = self._nextn_layer_id()
        pre = f"model.layers.{nid}."
        m: Dict[str, tuple] = {
            pre + "enorm.weight": ("enorm", None),
            pre + "hnorm.weight": ("hnorm", None),
            pre + "eh_proj.weight": ("eh_proj", "transpose"),
            pre + "shared_head.norm.weight": ("shared_norm", None),
        }
        # decoder tensors: remap the layer-0 entries of the full map onto
        # the nextn layer prefix and the single "mtp" param group
        src_pre = "model.layers.0."
        for name, (dest, tf) in full.items():
            if name.startswith(src_pre) and dest.startswith(f"{_lk(0)}."):
                m[pre + name[len(src_pre):]] = (
                    "mtp." + dest[len(_lk(0)) + 1 :],
                    tf,
                )
        return m, {}

    # ------------------------------------------------------------------
    def make_draft_pool(self, num_pages: int, page_size: int, mesh):
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        rep = NamedSharding(mesh, P())
        return MLALatentPool(
            ckv=jax.device_put(
                jnp.zeros((1, num_pages, page_size, self.kv_rank), dt), rep
            ),
            kpe=jax.device_put(
                jnp.zeros((1, num_pages, page_size, KPE_PAD), dt), rep
            ),
        )

    def forward(
        self,
        params: Dict[str, Any],
        embed: jax.Array,  # target's embedding table [V, D]
        kv_pool: MLALatentPool,  # 1-layer draft latent pool
        fb: ForwardBatch,
        page_size: int,
        prev_hidden: jax.Array,  # [B, E, D] target hidden of previous pos
    ):
        """Returns (hidden [B, E, D] post shared_head.norm, new pool)."""
        c = self.config
        B, E = fb.input_ids.shape
        dt = prev_hidden.dtype
        eps = c.rms_norm_eps
        H = self.n_heads

        emb = embed[fb.input_ids].astype(dt)
        x = jnp.einsum(
            "bed,dh->beh",
            jnp.concatenate(
                [
                    rms_norm(emb, params["enorm"], eps),
                    rms_norm(prev_hidden.astype(dt), params["hnorm"], eps),
                ],
                axis=-1,
            ),
            params["eh_proj"],
        )

        lp = params["mtp"]
        h = rms_norm(x, lp["input_norm"], eps)
        q_abs, q_pe, c_kv, k_pe, w_kb_v = self._mla_qkv(lp, h, fb.positions)
        kv_pool = write_latent(
            kv_pool, jnp.int32(0), c_kv, k_pe, fb.out_slots
        )
        ctx = mla_attention_xla(
            q_abs, q_pe, kv_pool, jnp.int32(0), fb.page_tables,
            fb.seq_lens, fb.positions, page_size, self.scale,
        )
        att = jnp.einsum("behr,rhv->behv", ctx, w_kb_v)
        x = x + jnp.einsum(
            "beh,hd->bed", att.reshape(B, E, H * self.v_dim), lp["wo"]
        )
        h2 = rms_norm(x, lp["post_norm"], eps)
        x = x + self._ffn(lp, h2, 0)
        return rms_norm(x, params["shared_norm"], eps), kv_pool


ENTRY_CLASS = DeepseekNextNModel
