"""Generic `transformers` fallback execution (reference
`srt/models/transformers.py`): any HF decoder architecture NOT in the
native model registry still serves through the full engine — scheduler,
radix-free chunk cache, streaming, OpenAI API — by running the HF torch
modeling code on the host CPU behind the ModelRunner interface.

This is the correctness escape hatch, not a performance path: the TPU
engine's native zoo (models/registry.py) covers the serving-relevant
families; the fallback guarantees "any HF arch generates immediately"
like the reference's `model_impl=transformers` mode.

Constraints mirrored from the design:
  * per-request HF DynamicCache keyed by rid (the paged KV pool does not
    exist here); chunked prefill appends to the same rid cache in order
  * cross-request prefix reuse is disabled (the Engine forces the chunk
    cache when this runner is active)
  * greedy + temperature/top-k/top-p sampling on host
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional

import numpy as np

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.managers.schedule_batch import ForwardMode, ModelWorkerBatch
from sglang_npu_tpu.server_args import ServerArgs

logger = logging.getLogger(__name__)


class _FallbackHandle:
    def __init__(self, result):
        self.result = result
        self.chainable = False
        self.last_tokens = None


class TorchFallbackRunner:
    """ModelRunner-interface subset executing HF transformers on CPU."""

    # attributes the Scheduler/Engine probe
    dp_attn = 0
    swa_num_pages = 0
    swa_ring_pages = 0
    eagle = None
    lora_manager = None
    mesh = None
    kv_pool = None

    def __init__(self, server_args: ServerArgs, model_config: ModelConfig):
        import torch
        import transformers

        self.server_args = server_args
        self.model_config = model_config
        self.page_size = server_args.page_size
        total = server_args.max_total_tokens or 65536
        self.num_pages = max(total // server_args.page_size, 2)
        self._torch = torch
        t0 = time.time()
        self.model = transformers.AutoModelForCausalLM.from_pretrained(
            server_args.model_path,
            torch_dtype=torch.float32,
            trust_remote_code=server_args.trust_remote_code,
        )
        self.model.eval()
        self.param_bytes = sum(
            p.numel() * p.element_size() for p in self.model.parameters()
        )
        logger.info(
            "transformers fallback: loaded %s (%.1f MB) in %.1fs — "
            "arch %s has no native TPU implementation; serving via HF on CPU",
            server_args.model_path,
            self.param_bytes / 1e6,
            time.time() - t0,
            model_config.architectures,
        )
        # rid -> {"cache": DynamicCache, "pos": int}
        self._caches: Dict[str, Dict[str, Any]] = {}
        self.step_counter = 0
        self._rng = np.random.default_rng(server_args.random_seed)

    # ------------------------------------------------------------------
    def _cache_for(self, rid: str, fresh: bool):
        from transformers import DynamicCache

        if fresh or rid not in self._caches:
            self._caches[rid] = {"cache": DynamicCache(), "pos": 0}
        return self._caches[rid]

    def _prune(self, live_rids):
        live = set(live_rids)
        if len(self._caches) > max(4 * len(live) + 8, 64):
            for rid in list(self._caches):
                if rid not in live:
                    del self._caches[rid]

    def _sample_row(self, logits: np.ndarray, sp, i: int) -> int:
        """Host sampling: greedy / temperature with top-k/top-p."""
        temps = sp.temperatures if sp is not None else None
        t = float(temps[i]) if temps is not None else 0.0
        if t <= 1e-5:
            return int(np.argmax(logits))
        probs = logits.astype(np.float64) / t
        probs -= probs.max()
        probs = np.exp(probs)
        if sp.top_ks is not None and int(sp.top_ks[i]) > 0:
            k = int(sp.top_ks[i])
            idx = np.argpartition(probs, -k)[:-k]
            probs[idx] = 0.0
        probs /= probs.sum()
        if sp.top_ps is not None and float(sp.top_ps[i]) < 1.0:
            order = np.argsort(-probs)
            cdf = np.cumsum(probs[order])
            cut = np.searchsorted(cdf, float(sp.top_ps[i])) + 1
            mask = np.zeros_like(probs)
            mask[order[:cut]] = probs[order[:cut]]
            probs = mask / mask.sum()
        return int(self._rng.choice(len(probs), p=probs))

    # ------------------------------------------------------------------
    def forward_and_sample(self, mwb: ModelWorkerBatch):
        torch = self._torch
        B = mwb.real_bs
        sp = mwb.sampling_info
        self.step_counter += 1
        self._prune(mwb.rids)
        with torch.no_grad():
            if mwb.forward_mode == ForwardMode.EXTEND:
                toks = np.zeros(B, dtype=np.int64)
                lp = np.zeros(B, dtype=np.float32)
                off = 0
                for i in range(B):
                    n = int(mwb.extend_seq_lens[i])
                    pre = int(mwb.extend_prefix_lens[i])
                    ids = mwb.input_ids[off : off + n]
                    off += n
                    ent = self._cache_for(mwb.rids[i], fresh=(pre == 0))
                    if ent["pos"] != pre:
                        # retraction/prefix mismatch: replay from scratch is
                        # the scheduler's job (it re-extends from 0)
                        ent = self._cache_for(mwb.rids[i], fresh=True)
                    out = self.model(
                        input_ids=torch.tensor(ids, dtype=torch.long)[None],
                        past_key_values=ent["cache"],
                        use_cache=True,
                    )
                    ent["cache"] = out.past_key_values
                    ent["pos"] = pre + n
                    logits = out.logits[0, -1].float().numpy()
                    toks[i] = self._sample_row(logits, sp, i)
                    if mwb.return_logprob:
                        z = logits - logits.max()
                        lp[i] = z[toks[i]] - np.log(np.exp(z).sum())
                info = (
                    {"chosen": lp, "top_vals": None, "top_ids": None,
                     "input_logprobs": None}
                    if mwb.return_logprob
                    else None
                )
                return toks, info
            # decode window
            K = mwb.decode_steps
            toks = np.zeros((B, K), dtype=np.int64)
            lps = np.zeros((B, K), dtype=np.float32)
            for i in range(B):
                ent = self._caches.get(mwb.rids[i])
                if ent is None:
                    raise RuntimeError(
                        f"fallback cache missing for {mwb.rids[i]}"
                    )
                cur = int(mwb.input_ids[i])
                limit = int(mwb.decode_limits[i]) - int(mwb.seq_lens[i])
                for k in range(K):
                    if k >= max(limit, 0):
                        toks[i, k] = cur
                        continue
                    out = self.model(
                        input_ids=torch.tensor([[cur]], dtype=torch.long),
                        past_key_values=ent["cache"],
                        use_cache=True,
                    )
                    ent["cache"] = out.past_key_values
                    ent["pos"] += 1
                    logits = out.logits[0, -1].float().numpy()
                    cur = self._sample_row(logits, sp, i)
                    toks[i, k] = cur
                    if mwb.return_logprob:
                        z = logits - logits.max()
                        lps[i, k] = z[cur] - np.log(np.exp(z).sum())
            info = (
                {"chosen": lps, "top_vals": None, "top_ids": None,
                 "input_logprobs": None}
                if mwb.return_logprob
                else None
            )
            return toks, info

    # decode dispatch/fetch protocol (no pipelining on the host path)
    def decode_dispatch(self, mwb: ModelWorkerBatch, chain_from=None):
        assert chain_from is None
        return _FallbackHandle(self.forward_and_sample(mwb))

    def decode_fetch(self, handle: _FallbackHandle):
        return handle.result

    # ------------------------------------------------------------------
    def flush_kv(self):
        self._caches.clear()

    def release_memory(self):
        self._caches.clear()

    def resume_memory(self):
        pass

    def rebalance_experts(self) -> bool:
        return False

    def expert_load_snapshot(self):
        return None

    def update_weights_from_disk(self, model_path: str, load_format="auto"):
        import transformers

        try:
            self.model = transformers.AutoModelForCausalLM.from_pretrained(
                model_path, torch_dtype=self._torch.float32,
                trust_remote_code=self.server_args.trust_remote_code,
            )
            self.model.eval()
            self._caches.clear()
            return True, "ok"
        except Exception as e:  # pragma: no cover
            return False, str(e)

    def update_weights_from_tensor(self, named_tensors):
        import torch

        sd = dict(self.model.state_dict())
        for name, arr in named_tensors:
            if name in sd:
                sd[name] = torch.tensor(np.asarray(arr))
        self.model.load_state_dict(sd)
        self._caches.clear()
        return True, "ok"

    def forward_embedding(self, mwb):  # pragma: no cover
        raise NotImplementedError(
            "embedding mode is not supported by the transformers fallback"
        )
