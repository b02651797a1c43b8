"""EAGLE speculative-decoding runner.

Counterpart of the reference's `srt/speculative/eagle_worker.py:73`
(`draft:531`, `verify:668`, `forward_draft_extend:813`) and
`build_eagle_tree.py`, re-designed for TPU dispatch economics:

  * ONE fused jit per draft+verify: the S-step chain draft (top-k
    candidates per depth, rank-0 path expanded) feeds straight into the
    target's tree-verify forward; only the small candidate/prediction
    tensors reach the host for the accept walk.
  * Verify never writes the pool: accepted rows are committed afterwards
    from the per-layer fed K/V the verify pass returns (XLA scatter for
    the XLA pool; the prefill kernel's write-only RMW phase for the
    Pallas pool) fused with the draft-KV extend in a second dispatch.
  * Target hidden states never leave the device: a slot-indexed
    `hidden_buf` carries each running request's last hidden across
    rounds (host round-trips of [B, D] would cost ~150ms over the
    tunneled link).

Static tree topology ("chain with siblings"): depth s holds the top-k
candidates after the rank-0 path of depth s-1.  Only the rank-0 path is
drafted deeper, so the draft runs exactly S forwards per round, while
siblings still catch the common case of the target picking the #2/#3
token (accepting a sibling ends the round — its continuation was never
drafted)."""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.managers.schedule_batch import ModelWorkerBatch
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch, pad_to
from sglang_npu_tpu.models.llama_eagle import EagleDraftModel
from sglang_npu_tpu.utils.common import next_power_of_2

logger = logging.getLogger(__name__)


def tree_accept_walk(cand_i, par_i, preds_i, S: int, K: int):
    """Greedy tree walk for one request (reference `verify_tree_greedy`):
    descend from the root, at each depth accepting the child of the
    CURRENT node whose token matches the target's prediction there.
    Returns (accepted [(token, node_idx)...], last_node)."""
    cur = 0
    cur_rank = 0
    accepted = []
    for s in range(S):
        pred = int(preds_i[cur])
        hits = np.nonzero((cand_i[s] == pred) & (par_i[s] == cur_rank))[0]
        if len(hits) == 0:
            break
        r = int(hits[0])
        cur = 1 + s * K + r
        cur_rank = r
        accepted.append((pred, cur))
    return accepted, cur


def build_tree_mask(steps: int, topk: int) -> np.ndarray:
    """[T, T] ancestor-or-self mask for the chain-with-siblings tree.
    Node 0 = root; node (s, r) at index 1 + s*topk + r, parent = root for
    s=0 else (s-1, 0)."""
    T = 1 + steps * topk
    m = np.zeros((T, T), dtype=bool)
    for i in range(T):
        m[i, i] = True
        m[i, 0] = True
    for s in range(steps):
        for r in range(topk):
            i = 1 + s * topk + r
            for s2 in range(s):
                m[i, 1 + s2 * topk] = True  # rank-0 ancestors
    return m


class EagleRunner:
    def __init__(self, server_args, target_runner):
        self.target = target_runner
        self.server_args = server_args
        self.page_size = server_args.page_size
        self.steps = max(server_args.speculative_num_steps, 1)
        self.topk = max(server_args.speculative_eagle_topk, 1)
        self.tree_size = 1 + self.steps * self.topk
        self.tree_mask = jnp.asarray(build_tree_mask(self.steps, self.topk))

        path = server_args.speculative_draft_model_path
        cfg = ModelConfig.from_model_path(path, dtype=server_args.dtype)
        # EAGLE heads inherit missing dims from the target config
        tc = target_runner.model_config
        self.config = cfg
        algo = (server_args.speculative_algorithm or "EAGLE").upper()
        self.is_mtp = algo in ("NEXTN", "MTP")
        self.is_eagle3 = algo == "EAGLE3"
        if not self.is_eagle3 and cfg.vocab_size != tc.vocab_size:
            raise ValueError("EAGLE draft vocab must match target")
        if self.is_mtp:
            if any("MiMo" in a for a in (cfg.architectures or [])):
                # Xiaomi MiMo MTP head (reference srt/models/mimo_mtp.py):
                # a Qwen2-block draft over a standard paged KV pool
                from sglang_npu_tpu.models.mimo import MiMoMTPModel

                self.model = MiMoMTPModel(cfg)
            else:
                from sglang_npu_tpu.models.deepseek_nextn import (
                    DeepseekNextNModel,
                )

                self.model = DeepseekNextNModel(cfg)
        elif self.is_eagle3:
            from sglang_npu_tpu.models.llama_eagle import Eagle3DraftModel

            self.model = Eagle3DraftModel(cfg)
            # aux capture points: config ids are "output of layer i";
            # the reference default [2, L//2, L-3] is in before-layer
            # space (output of i-1) — srt/models/llama.py:748
            Lt = tc.num_hidden_layers
            ids = cfg.hf_config.get("eagle_aux_hidden_state_layer_ids")
            if ids is None:
                ids = [2 - 1, Lt // 2 - 1, Lt - 3 - 1]
            self.aux_after = tuple(
                int(min(max(i, 0), Lt - 1)) for i in ids
            )
        else:
            self.model = EagleDraftModel(cfg)
        from sglang_npu_tpu.model_loader.loader import load_model_weights

        self.params = load_model_weights(
            self.model, path, server_args.load_format, target_runner.mesh,
            seed=server_args.random_seed,
        )
        if not self.is_mtp and not self.is_eagle3:
            self.params = self._fix_missing_norms(self.params)

        # draft KV pool: same page/slot space as the target
        from sglang_npu_tpu.ops.mla_attention import MLALatentPool

        self.target_is_mla = isinstance(target_runner.kv_pool, MLALatentPool)
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.kv_pool = self.model.make_draft_pool(
            target_runner.num_pages, self.page_size, target_runner.mesh
        )
        rep = NamedSharding(target_runner.mesh, P())

        self.max_slots = min(server_args.max_running_requests or 2048, 4096)
        # eagle3 conditions on fc-folded DRAFT-width hiddens
        D = cfg.hidden_size if self.is_eagle3 else tc.hidden_size
        self.hidden_buf = jax.device_put(
            jnp.zeros((self.max_slots, D), dt), rep
        )
        self._dv_fn = None
        self._commit_fn = None

    def _fix_missing_norms(self, params):
        """EAGLE-1 checkpoints omit layer-0 input_layernorm (the fc output
        enters the layer unnormalized); the loader zero-fills missing
        tensors, which would zero the activations — replace all-zero norm
        rows with ones."""

        @jax.jit
        def fix(p):
            ln = p["layers"]["input_norm"]
            dead = jnp.sum(jnp.abs(ln), axis=-1, keepdims=True) == 0
            ln = jnp.where(dead, 1.0, ln)
            pn = p["layers"]["post_norm"]
            deadp = jnp.sum(jnp.abs(pn), axis=-1, keepdims=True) == 0
            pn = jnp.where(deadp, 1.0, pn)
            layers = dict(p["layers"])
            layers["input_norm"] = ln
            layers["post_norm"] = pn
            return {**p, "layers": layers}

        return fix(self.params)

    # ------------------------------------------------------------------
    def _head(self, t_params):
        return (
            t_params["embed"].T
            if "lm_head" not in t_params
            else t_params["lm_head"]
        )

    def _build_draft_verify(self):
        """MTP drafts keep the chain expansion (the NextN head has no
        tree_step); EAGLE/EAGLE3 run the full top-k tree."""
        if self.is_mtp or self.topk == 1:
            return self._build_draft_verify_chain()
        return self._build_draft_verify_tree()

    def _build_draft_verify_tree(self):
        """Full top-k tree draft (reference `build_eagle_tree.py`,
        `eagle_worker.draft_forward:609`): at every depth ALL K live beams
        expand (beam-search over cumulative draft logprob), so the target
        can accept along any branch — the accept-length workhorse the
        chain-with-siblings topology lacked.  The per-request tree mask is
        data-dependent and built on device from the parent ranks."""
        dmodel = self.model
        tmodel = self.target.model
        ps = self.page_size
        S, K = self.steps, self.topk
        c = dmodel.config
        Ld, Hkv, Dh = (
            c.num_hidden_layers, c.num_key_value_heads, c.head_dim,
        )
        T = self.tree_size

        def fn(t_params, d_params, t_pool, d_pool, hidden_buf,
               root_tokens, slots, page_tables, seq_lens, out_slots):
            B = root_tokens.shape[0]
            embed = t_params["embed"]
            head = self._head(t_params)
            prev_h = hidden_buf[slots]  # [B, D]
            D = prev_h.shape[-1]
            dt = prev_h.dtype
            prefix_lens = seq_lens - 1  # committed draft-KV tokens

            def logits_of(h):
                if self.is_eagle3:
                    return dmodel.draft_logits(d_params, h)
                return jnp.einsum(
                    "bkd,dv->bkv", h, head,
                    preferred_element_type=jnp.float32,
                )

            path_k = jnp.zeros((Ld, B, K, S, Hkv, Dh), dt)
            path_v = jnp.zeros_like(path_k)
            # depth 0: all K rows are the root; select from row 0
            tok = jnp.broadcast_to(root_tokens[:, None], (B, K))
            h, nk, nv = dmodel.tree_step(
                d_params, embed, d_pool, page_tables, prefix_lens,
                seq_lens - 1, tok,
                jnp.broadcast_to(prev_h[:, None], (B, K, D)),
                path_k, path_v, 0, ps,
            )
            lg0 = jax.nn.log_softmax(logits_of(h)[:, 0], axis=-1)  # [B, Vd]
            lp0, ti0 = jax.lax.top_k(lg0, K)
            cand0 = (
                dmodel.map_draft_ids(d_params, ti0.astype(jnp.int32))
                if self.is_eagle3
                else ti0.astype(jnp.int32)
            )
            cands, pars = [cand0], [jnp.zeros((B, K), jnp.int32)]
            path_logp = lp0
            root_kv_k = jnp.broadcast_to(
                nk[:, :, :1], (Ld, B, K, Hkv, Dh)
            )
            root_kv_v = jnp.broadcast_to(
                nv[:, :, :1], (Ld, B, K, Hkv, Dh)
            )
            path_k = path_k.at[:, :, :, 0].set(root_kv_k)
            path_v = path_v.at[:, :, :, 0].set(root_kv_v)
            beam_h = jnp.broadcast_to(h[:, :1], h.shape)
            tok = cand0
            for s in range(1, S):
                h, nk, nv = dmodel.tree_step(
                    d_params, embed, d_pool, page_tables, prefix_lens,
                    seq_lens - 1 + s, tok, beam_h, path_k, path_v, s, ps,
                )
                lg = jax.nn.log_softmax(logits_of(h), axis=-1)  # [B, K, Vd]
                clp, cti = jax.lax.top_k(lg, K)  # [B, K, K]
                scores = (path_logp[:, :, None] + clp).reshape(B, K * K)
                top_s, top_i = jax.lax.top_k(scores, K)
                parent = (top_i // K).astype(jnp.int32)  # [B, K]
                sel = jnp.take_along_axis(
                    cti.reshape(B, K * K), top_i, axis=1
                ).astype(jnp.int32)
                if self.is_eagle3:
                    sel = dmodel.map_draft_ids(d_params, sel)
                path_logp = top_s
                pidx6 = parent[None, :, :, None, None, None]
                path_k = jnp.take_along_axis(path_k, pidx6, axis=2)
                path_v = jnp.take_along_axis(path_v, pidx6, axis=2)
                pidx5 = parent[None, :, :, None, None]
                path_k = path_k.at[:, :, :, s].set(
                    jnp.take_along_axis(nk, pidx5, axis=2)
                )
                path_v = path_v.at[:, :, :, s].set(
                    jnp.take_along_axis(nv, pidx5, axis=2)
                )
                beam_h = jnp.take_along_axis(h, parent[:, :, None], axis=1)
                cands.append(sel)
                pars.append(parent)
                tok = sel
            cand = jnp.stack(cands, axis=1)  # [B, S, K]
            par = jnp.stack(pars, axis=1)  # [B, S, K]

            # data-dependent ancestor mask [B, T, T] from parent ranks
            m = jnp.broadcast_to(jnp.eye(T, dtype=bool), (B, T, T))
            m = m | (jnp.arange(T) == 0)[None, None, :]
            for s in range(S):
                if s == 0:
                    pidx = jnp.zeros((B, K), jnp.int32)
                else:
                    pidx = 1 + (s - 1) * K + par[:, s]
                prow = jnp.take_along_axis(m, pidx[:, :, None], axis=1)
                selfhot = (
                    jnp.arange(T)[None, :]
                    == (1 + s * K + jnp.arange(K))[:, None]
                )  # [K, T]
                rows = prow | selfhot[None]
                m = jax.lax.dynamic_update_slice(
                    m, rows, (0, 1 + s * K, 0)
                )
            tree_mask = m

            fed = jnp.concatenate(
                [root_tokens[:, None], cand.reshape(B, S * K)], axis=1
            )
            depth = jnp.concatenate(
                [
                    jnp.zeros((1,), jnp.int32),
                    (jnp.arange(S * K, dtype=jnp.int32) // K) + 1,
                ]
            )
            fed_pos = (seq_lens - 1)[:, None] + depth[None, :]
            fbv = ForwardBatch(
                input_ids=fed,
                positions=fed_pos,
                out_slots=jnp.zeros_like(fed),
                page_tables=page_tables,
                seq_lens=seq_lens + S,
                extend_seq_lens=None,
                extend_prefix_lens=seq_lens - 1,
            )
            if self.is_eagle3:
                hidden, (kst, vst), aux = tmodel.verify_forward(
                    t_params, t_pool, fbv, ps, tree_mask,
                    aux_after=self.aux_after,
                )
                aux_cat = jnp.concatenate(
                    [aux[i] for i in range(aux.shape[0])], axis=-1
                )
                cond_hidden = dmodel.apply_fc(d_params, aux_cat)
            else:
                hidden, (kst, vst) = tmodel.verify_forward(
                    t_params, t_pool, fbv, ps, tree_mask
                )
                cond_hidden = hidden
            vlogits = jnp.einsum(
                "btd,dv->btv", hidden, head,
                preferred_element_type=jnp.float32,
            )
            preds = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)
            return cand, par, preds, cond_hidden, kst, vst, d_pool

        return jax.jit(fn, donate_argnums=(3,))

    def _build_draft_verify_chain(self):
        tmodel = self.target.model
        dmodel = self.model
        ps = self.page_size
        S, K = self.steps, self.topk
        tree_mask = self.tree_mask

        def fn(t_params, d_params, t_pool, d_pool, hidden_buf,
               root_tokens, slots, page_tables, seq_lens, out_slots):
            B = root_tokens.shape[0]
            embed = t_params["embed"]
            head = self._head(t_params)
            prev_h = hidden_buf[slots]  # [B, D]
            tok = root_tokens
            cands = []
            for s in range(S):
                pos = seq_lens - 1 + s
                fb = ForwardBatch(
                    input_ids=tok[:, None],
                    positions=pos[:, None],
                    out_slots=out_slots[:, s][:, None],
                    page_tables=page_tables,
                    seq_lens=seq_lens + s,
                    extend_seq_lens=None,
                    extend_prefix_lens=None,
                )
                h, d_pool = dmodel.forward(
                    d_params, embed, d_pool, fb, ps, prev_h[:, None]
                )
                h0 = h[:, 0]
                if self.is_eagle3:
                    logits = dmodel.draft_logits(d_params, h0)
                    topi = jax.lax.top_k(logits, K)[1].astype(jnp.int32)
                    topi = dmodel.map_draft_ids(d_params, topi)
                else:
                    logits = jnp.einsum(
                        "bd,dv->bv", h0, head,
                        preferred_element_type=jnp.float32,
                    )
                    topi = jax.lax.top_k(logits, K)[1].astype(jnp.int32)
                cands.append(topi)
                tok = topi[:, 0]
                prev_h = h0
            cand = jnp.stack(cands, axis=1)  # [B, S, K]

            fed = jnp.concatenate(
                [root_tokens[:, None], cand.reshape(B, S * K)], axis=1
            )  # [B, T]
            depth = jnp.concatenate(
                [
                    jnp.zeros((1,), jnp.int32),
                    (jnp.arange(S * K, dtype=jnp.int32) // K) + 1,
                ]
            )
            fed_pos = (seq_lens - 1)[:, None] + depth[None, :]
            fbv = ForwardBatch(
                input_ids=fed,
                positions=fed_pos,
                out_slots=jnp.zeros_like(fed),
                page_tables=page_tables,
                seq_lens=seq_lens + S,
                extend_seq_lens=None,
                extend_prefix_lens=seq_lens - 1,
            )
            if self.is_eagle3:
                hidden, (kst, vst), aux = tmodel.verify_forward(
                    t_params, t_pool, fbv, ps, tree_mask,
                    aux_after=self.aux_after,
                )
                # the draft conditions on fc(concat aux), not the final
                # hidden — fold here so commit/hidden_buf stay D-wide
                aux_cat = jnp.concatenate(
                    [aux[i] for i in range(aux.shape[0])], axis=-1
                )
                cond_hidden = dmodel.apply_fc(d_params, aux_cat)
            else:
                hidden, (kst, vst) = tmodel.verify_forward(
                    t_params, t_pool, fbv, ps, tree_mask
                )
                cond_hidden = hidden
            vlogits = jnp.einsum(
                "btd,dv->btv", hidden, head,
                preferred_element_type=jnp.float32,
            )
            preds = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)
            # chain topology: every node's parent is rank 0 of the previous
            # depth — par == zeros reproduces "sibling acceptance ends the
            # round" under the generalized tree walk
            par = jnp.zeros((root_tokens.shape[0], S, K), jnp.int32)
            return cand, par, preds, cond_hidden, kst, vst, d_pool

        return jax.jit(fn, donate_argnums=(3,))

    def draft_verify(self, mwb: ModelWorkerBatch):
        """Returns (cand [B,S,K], par [B,S,K], preds [B,T] on host;
        device residuals)."""
        if self._dv_fn is None:
            self._dv_fn = self._build_draft_verify()
        B = mwb.real_bs
        bs = next_power_of_2(B)
        pages_bucket = max(next_power_of_2(mwb.page_tables.shape[1]), 8)
        pt = pad_to(
            pad_to(mwb.page_tables, pages_bucket, axis=1), bs, axis=0
        )
        cand, par, preds, hidden, kst, vst, self.kv_pool = self._dv_fn(
            self.target.params,
            self.params,
            self.target.kv_pool,
            self.kv_pool,
            self.hidden_buf,
            jnp.asarray(pad_to(mwb.input_ids, bs)),
            jnp.asarray(pad_to(mwb.hidden_slots, bs)),
            jnp.asarray(pt),
            jnp.asarray(pad_to(np.maximum(mwb.seq_lens, 1), bs, fill=1)),
            jnp.asarray(pad_to(mwb.out_slots, bs)),
        )
        host = jax.device_get((cand, par, preds))
        return (
            np.asarray(host[0])[:B],
            np.asarray(host[1])[:B],
            np.asarray(host[2])[:B],
            (hidden, kst, vst),
        )

    # ------------------------------------------------------------------
    def _build_commit(self):
        dmodel = self.model
        ps = self.page_size
        C = self.steps + 1  # max committed rows (root + accepted chain)
        use_kernel = self.target.attention_backend_name == "pallas"

        def fn(t_params, d_params, t_pool, d_pool, hidden_buf,
               residual_hidden, kst, vst, fed_tokens,
               gather_idx, parent_idx, last_node, commit_lens,
               slots, page_tables, seq_lens, out_slots):
            B, T = fed_tokens.shape
            embed = t_params["embed"]
            valid = (
                jnp.arange(C, dtype=jnp.int32)[None, :] < commit_lens[:, None]
            )
            commit_slots = jnp.where(valid, out_slots[:, :C], 0)

            if self.target_is_mla:
                # latent rows to commit: [L, B, C, R] / [L, B, C, rope]
                gi = gather_idx[None, :, :, None]
                ckv_c = jnp.take_along_axis(kst, gi, axis=2)
                kpe_c = jnp.take_along_axis(vst, gi, axis=2)
                t_pool = self._write_rows_latent(
                    t_pool, ckv_c, kpe_c, commit_slots
                )
            else:
                # rows to commit: [Ld, B, C, Hkv, Dh]
                gi = gather_idx[None, :, :, None, None]
                k_c = jnp.take_along_axis(kst, gi, axis=2)
                v_c = jnp.take_along_axis(vst, gi, axis=2)
                if use_kernel:
                    t_pool = self._write_rows_kernel(
                        t_pool, k_c, v_c, page_tables, seq_lens, commit_lens
                    )
                else:
                    t_pool = self._write_rows_scatter(
                        t_pool, k_c, v_c, commit_slots
                    )

            # draft extend over committed tokens (corrects the draft KV
            # written during drafting with true target hiddens)
            toks = jnp.take_along_axis(fed_tokens, gather_idx, axis=1)
            root_h = hidden_buf[slots]  # [B, D]
            par_h = jnp.take_along_axis(
                residual_hidden, parent_idx[:, :, None], axis=1
            )  # [B, C, D]
            prev_h = jnp.concatenate(
                [root_h[:, None], par_h[:, 1:]], axis=1
            )
            pos = (seq_lens - 1)[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
            fb = ForwardBatch(
                input_ids=jnp.where(valid, toks, 0),
                positions=pos,
                out_slots=commit_slots,
                page_tables=page_tables,
                seq_lens=seq_lens - 1 + commit_lens,
                extend_seq_lens=None,
                extend_prefix_lens=None,
            )
            _, d_pool = dmodel.forward(
                d_params, embed, d_pool, fb, ps, prev_h
            )
            new_h = jnp.take_along_axis(
                residual_hidden, last_node[:, None, None], axis=1
            )[:, 0]
            hidden_buf = hidden_buf.at[slots].set(
                new_h.astype(hidden_buf.dtype), mode="drop"
            )
            return t_pool, d_pool, hidden_buf

        return jax.jit(fn, donate_argnums=(2, 3, 4))

    def _write_rows_latent(self, t_pool, ckv_c, kpe_c, commit_slots):
        """MLA target pool: scatter accepted latent rows (safe — the
        latent pool takes the XLA attention path, no pallas layout
        conflict).  ckv_c [L, B, C, R], kpe_c [L, B, C, rope]."""
        from sglang_npu_tpu.ops.mla_attention import (
            KPE_PAD,
            MLA_SCALE_LANE,
            MLALatentPool,
            quant_latent_rows,
        )

        ps = self.page_size
        flat = commit_slots.reshape(-1)
        pages = flat // ps
        offs = flat % ps
        L = ckv_c.shape[0]
        rope = kpe_c.shape[-1]
        ckv_rows = ckv_c.reshape(L, -1, ckv_c.shape[-1])
        kpe_rows = jnp.pad(
            kpe_c.reshape(L, -1, rope), ((0, 0), (0, 0), (0, KPE_PAD - rope))
        )
        if t_pool.quantized:
            ckv_rows, s = quant_latent_rows(
                ckv_rows, t_pool.ckv.dtype, t_pool.qmax
            )
            lane = jnp.arange(KPE_PAD)[None, None, :] == MLA_SCALE_LANE
            kpe_rows = jnp.where(lane, s.astype(kpe_rows.dtype), kpe_rows)
        # adjacent advanced indices (dims 1, 2) stay in place: view [L, n, R]
        ckv = t_pool.ckv.at[:, pages, offs].set(
            ckv_rows.astype(t_pool.ckv.dtype), mode="drop"
        )
        kpe = t_pool.kpe.at[:, pages, offs].set(
            kpe_rows.astype(t_pool.kpe.dtype), mode="drop"
        )
        return MLALatentPool(ckv=ckv, kpe=kpe)

    def _write_rows_scatter(self, t_pool, k_c, v_c, commit_slots):
        """XLA-backend pool: one scatter per K/V (safe — this pool never
        meets a pallas_call, so no layout conflict)."""
        ps = self.page_size
        flat = commit_slots.reshape(-1)
        pages = flat // ps
        offs = flat % ps
        Ld, _, _, Hkv, Dh = k_c.shape
        # [Ld, B, C, H, D] -> [Ld, H, n, D] (n = B*C)
        kr = jnp.moveaxis(k_c.reshape(Ld, -1, Hkv, Dh), 1, 2)
        vr = jnp.moveaxis(v_c.reshape(Ld, -1, Hkv, Dh), 1, 2)
        from sglang_npu_tpu.ops.xla_attention import QuantKVPool

        if isinstance(t_pool, QuantKVPool):
            # per-(token, head) scales like write_kv's quant path; the
            # scalar kv index + separated page/off arrays put the token
            # dim FIRST in the indexed view: value layout [n, L, H, (D)]
            data, scale = t_pool.data, t_pool.scale
            for idx, rows in ((0, kr), (1, vr)):
                t = jnp.moveaxis(rows, 2, 0).astype(jnp.float32)  # [n,L,H,D]
                s = jnp.maximum(jnp.max(jnp.abs(t), -1) / 127.0, 1e-8)
                q = jnp.clip(jnp.round(t / s[..., None]), -127, 127)
                data = data.at[:, idx, :, pages, offs].set(
                    q.astype(jnp.int8), mode="drop"
                )
                scale = scale.at[:, idx, :, pages, offs].set(s, mode="drop")
            return QuantKVPool(data, scale)
        # pool.at[:, 0, :, pages, offs]: the scalar kv index makes the
        # advanced indices non-adjacent, so the indexed view is
        # [n, L, H, D] (token dim first)
        t_pool = t_pool.at[:, 0, :, pages, offs].set(
            jnp.moveaxis(kr, 2, 0).astype(t_pool.dtype), mode="drop"
        )
        t_pool = t_pool.at[:, 1, :, pages, offs].set(
            jnp.moveaxis(vr, 2, 0).astype(t_pool.dtype), mode="drop"
        )
        return t_pool

    def _write_rows_kernel(self, t_pool, k_c, v_c, page_tables, seq_lens,
                           commit_lens):
        """Pallas-backend pool: the prefill kernel's write-only RMW phase,
        scanned over layers (an XLA scatter would force full-pool relayout
        copies at every pallas program boundary)."""
        import os

        from sglang_npu_tpu.ops.pallas.prefill_kernel import (
            paged_prefill_attention_fused,
        )

        ps = self.page_size
        Ld, B, C, Hkv, Dh = k_c.shape
        E_c = max(next_power_of_2(C), ps, 16)
        pad_c = E_c - C
        k_cE = jnp.pad(k_c, ((0, 0), (0, 0), (0, pad_c), (0, 0), (0, 0)))
        v_cE = jnp.pad(v_c, ((0, 0), (0, 0), (0, pad_c), (0, 0), (0, 0)))
        Hq = self.target.model_config.num_attention_heads
        q_zero = jnp.zeros((B, E_c, Hq, Dh), k_c.dtype)
        interp = os.environ.get("SGLANG_TPU_PALLAS_INTERPRET", "0") == "1"
        commit_seq = seq_lens - 1 + commit_lens  # rows beyond are masked
        prefix = seq_lens - 1

        def write_layer(pool, xs):
            l, kc, vc = xs
            _, pool = paged_prefill_attention_fused(
                q_zero, kc, vc, pool, l, page_tables, commit_seq, prefix,
                ps, 1.0, write_only=True, interpret=interp,
            )
            return pool, None

        t_pool, _ = jax.lax.scan(
            write_layer,
            t_pool,
            (jnp.arange(Ld, dtype=jnp.int32), k_cE, v_cE),
        )
        return t_pool

    def commit(self, mwb, residuals, fed_tokens, gather_idx, parent_idx,
               last_node, commit_lens):
        if self._commit_fn is None:
            self._commit_fn = self._build_commit()
        hidden, kst, vst = residuals
        B = mwb.real_bs
        bs = hidden.shape[0]  # already padded to the draft_verify bucket
        pages_bucket = max(next_power_of_2(mwb.page_tables.shape[1]), 8)
        pt = pad_to(
            pad_to(mwb.page_tables, pages_bucket, axis=1), bs, axis=0
        )
        C = self.steps + 1
        self.target.kv_pool, self.kv_pool, self.hidden_buf = self._commit_fn(
            self.target.params,
            self.params,
            self.target.kv_pool,
            self.kv_pool,
            self.hidden_buf,
            hidden,
            kst,
            vst,
            jnp.asarray(pad_to(fed_tokens, bs)),
            jnp.asarray(pad_to(gather_idx, bs)),
            jnp.asarray(pad_to(parent_idx, bs)),
            jnp.asarray(pad_to(last_node, bs)),
            jnp.asarray(pad_to(commit_lens, bs)),
            jnp.asarray(pad_to(mwb.hidden_slots, bs)),
            jnp.asarray(pt),
            jnp.asarray(pad_to(np.maximum(mwb.seq_lens, 1), bs, fill=1)),
            jnp.asarray(pad_to(mwb.out_slots, bs)),
        )

    # ------------------------------------------------------------------
    def release_slot(self, slot: int):
        pass  # hidden_buf rows are overwritten on reuse

    def flush(self):
        self.kv_pool = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x), self.kv_pool
        )
