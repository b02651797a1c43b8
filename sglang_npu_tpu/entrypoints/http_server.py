"""HTTP serving API.

Counterpart of the reference's `srt/entrypoints/http_server.py` (FastAPI app:
`/generate:345`, `/health:233`, `/flush_cache:430`, `/get_model_info`,
OpenAI routes `:767-847`).  Built on aiohttp (this image carries no
fastapi/pydantic); request/response schemas live in
`entrypoints/openai/protocol.py` as plain dataclasses with explicit
validation — same wire format as the reference.
"""

from __future__ import annotations

import asyncio
import dataclasses
import json
import logging
import os
import time
from typing import Any, Dict, Optional

from aiohttp import web

from sglang_npu_tpu.managers.io_struct import GenerateReqInput
from sglang_npu_tpu.server_args import ServerArgs, prepare_server_args

logger = logging.getLogger(__name__)


def _json_error(message: str, status: int = 400, etype: str = "invalid_request_error"):
    return web.json_response(
        {"error": {"message": message, "type": etype}}, status=status
    )


async def _json_body(request: web.Request) -> dict:
    """Parse a JSON object body; malformed/non-dict bodies become the same
    structured 400 every route uses (instead of an unhandled aiohttp 500)."""
    try:
        body = await request.json()
    except Exception:
        raise web.HTTPBadRequest(
            text=json.dumps(
                {"error": {"message": "invalid JSON body", "type": "invalid_request_error"}}
            ),
            content_type="application/json",
        )
    if not isinstance(body, dict):
        raise web.HTTPBadRequest(
            text=json.dumps(
                {"error": {"message": "JSON body must be an object", "type": "invalid_request_error"}}
            ),
            content_type="application/json",
        )
    return body


class HttpServer:
    def __init__(self, engine):
        self.engine = engine
        self.tm = engine.tokenizer_manager
        self.start_time = time.time()
        from sglang_npu_tpu.entrypoints.openai.serving_chat import ChatServing
        from sglang_npu_tpu.entrypoints.openai.serving_completions import (
            CompletionServing,
        )

        self.chat_serving = ChatServing(engine)
        self.completion_serving = CompletionServing(engine)

    # ------------------------------------------------------------------
    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=256 * 1024 * 1024)
        r = app.router
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_get("/get_model_info", self.get_model_info)
        r.add_get("/get_server_info", self.get_server_info)
        r.add_post("/generate", self.generate)
        r.add_post("/flush_cache", self.flush_cache)
        r.add_post("/abort_request", self.abort_request)
        r.add_post("/update_weights_from_disk", self.update_weights_from_disk)
        r.add_post("/save_sharded_state", self.save_sharded_state)
        r.add_post("/load_lora_adapter", self.load_lora_adapter)
        r.add_post("/unload_lora_adapter", self.unload_lora_adapter)
        r.add_post(
            "/init_weights_update_group", self.init_weights_update_group
        )
        r.add_post(
            "/update_weights_from_distributed",
            self.update_weights_from_distributed,
        )
        r.add_post("/prefill_only", self.prefill_only)
        r.add_post("/receive_prefill", self.receive_prefill)
        r.add_post("/pd_register", self.pd_register)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_post("/open_session", self.open_session)
        r.add_post("/close_session", self.close_session)
        r.add_post("/release_memory_occupation", self.release_memory)
        r.add_post("/resume_memory_occupation", self.resume_memory)
        r.add_post("/pause_generation", self.pause_generation)
        r.add_get("/kv_events", self.kv_events)
        r.add_get("/expert_distribution", self.expert_distribution)
        r.add_post("/rebalance_experts", self.rebalance_experts)
        r.add_post("/continue_generation", self.continue_generation)
        r.add_post("/encode", self.encode)
        r.add_post("/classify", self.classify)
        r.add_post("/v1/embeddings", self.v1_embeddings)
        r.add_get("/v1/models", self.models)
        r.add_post("/v1/score", self.v1_score)
        r.add_post("/v1/rerank", self.v1_rerank)
        r.add_post("/v1/completions", self.v1_completions)
        r.add_post("/v1/chat/completions", self.v1_chat_completions)
        r.add_get("/metrics", self.metrics)
        return app

    # ------------------------------------------------------------------
    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="", status=200)

    async def health_generate(self, request: web.Request) -> web.Response:
        """Generate one token through the whole stack (reference
        `/health_generate`)."""
        obj = GenerateReqInput(
            input_ids=[1, 2, 3],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        try:
            async for _ in self.tm.generate_request(obj):
                pass
            return web.Response(text="", status=200)
        except Exception as e:
            return _json_error(f"health generate failed: {e}", 503)

    async def get_model_info(self, request: web.Request) -> web.Response:
        args = self.engine.server_args
        return web.json_response(
            {
                "model_path": args.model_path,
                "tokenizer_path": args.tokenizer_path,
                "is_generation": True,
                "served_model_name": args.served_model_name,
            }
        )

    async def get_server_info(self, request: web.Request) -> web.Response:
        internal = await asyncio.to_thread(self.engine.get_internal_state)
        return web.json_response(
            {
                **dataclasses.asdict(self.engine.server_args),
                **internal,
                "uptime": time.time() - self.start_time,
                "version": __import__("sglang_npu_tpu").__version__,
            }
        )

    async def metrics(self, request: web.Request) -> web.Response:
        try:
            from sglang_npu_tpu.metrics.collector import render_prometheus

            text = render_prometheus(self.engine)
            return web.Response(text=text, content_type="text/plain")
        except Exception as e:
            return _json_error(str(e), 500)

    # ------------------------------------------------------------------
    async def generate(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await _json_body(request)
        except Exception:
            return _json_error("invalid JSON body")
        try:
            obj = GenerateReqInput(
                text=body.get("text"),
                input_ids=body.get("input_ids"),
                sampling_params=body.get("sampling_params"),
                rid=body.get("rid"),
                return_logprob=body.get("return_logprob", False),
                logprob_start_len=body.get("logprob_start_len", -1),
                top_logprobs_num=body.get("top_logprobs_num", 0),
                image_data=body.get("image_data"),
                stream=body.get("stream", False),
                lora_path=body.get("lora_path"),
                session_params=body.get("session_params"),
            )
            obj.post_init()
        except ValueError as e:
            return _json_error(str(e))

        if obj.stream:
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                }
            )
            await resp.prepare(request)
            try:
                async for chunk in self.tm.generate_request(obj):
                    await resp.write(
                        b"data: " + json.dumps(chunk).encode() + b"\n\n"
                    )
                await resp.write(b"data: [DONE]\n\n")
            except Exception as e:
                logger.exception("stream error")
                await resp.write(
                    b"data: "
                    + json.dumps({"error": {"message": str(e)}}).encode()
                    + b"\n\n"
                )
            await resp.write_eof()
            return resp

        try:
            results = []
            async for chunk in self.tm.generate_request(obj):
                results.append(chunk)
            if obj.is_single:
                return web.json_response(results[-1])
            return web.json_response(results)
        except ValueError as e:
            return _json_error(str(e))

    async def flush_cache(self, request: web.Request) -> web.Response:
        ok = await asyncio.to_thread(self.engine.flush_cache)
        return web.Response(
            text="Cache flushed.\n" if ok else "Cache not flushed (busy).\n",
            status=200 if ok else 503,
        )

    async def abort_request(self, request: web.Request) -> web.Response:
        body = await _json_body(request)
        self.engine.abort_request(
            rid=body.get("rid", ""), abort_all=body.get("abort_all", False)
        )
        return web.Response(text="", status=200)

    async def encode(self, request: web.Request) -> web.Response:
        """Native embedding API (reference `/encode:406`)."""
        if not self.engine.server_args.is_embedding:
            return _json_error("server not launched with --is-embedding", 400)
        body = await _json_body(request)
        try:
            out = await asyncio.to_thread(
                self.engine.encode,
                body.get("text"),
                body.get("input_ids"),
                body.get("rid"),
            )
            return web.json_response(out)
        except ValueError as e:
            return _json_error(str(e))

    async def classify(self, request: web.Request) -> web.Response:
        """Class logits from a sequence-classification / reward head
        (reference `/classify:418` — same EmbeddingReqInput path as
        `/encode`; the pooled-head "embedding" IS the logits vector)."""
        if not self.engine.server_args.is_embedding:
            return _json_error("server not launched with --is-embedding", 400)
        body = await _json_body(request)
        try:
            out = await asyncio.to_thread(
                self.engine.encode,
                body.get("text"),
                body.get("input_ids"),
                body.get("rid"),
            )
        except ValueError as e:
            return _json_error(str(e))
        # same wire format as /encode — the pooled "embedding" IS the class
        # logits vector (reference returns the EmbeddingReqInput result as-is)
        return web.json_response(out)

    async def v1_embeddings(self, request: web.Request) -> web.Response:
        if not self.engine.server_args.is_embedding:
            return _json_error("server not launched with --is-embedding", 400)
        body = await _json_body(request)
        inp = body.get("input")
        if inp is None:
            return _json_error("you must provide an input")
        try:
            out = await asyncio.to_thread(self.engine.encode, inp)
        except ValueError as e:
            return _json_error(str(e))
        outs = out if isinstance(out, list) else [out]
        data = [
            {"object": "embedding", "index": i, "embedding": o["embedding"]}
            for i, o in enumerate(outs)
        ]
        total = sum(o["meta_info"]["prompt_tokens"] for o in outs)
        return web.json_response(
            {
                "object": "list",
                "data": data,
                "model": body.get("model", "default"),
                "usage": {"prompt_tokens": total, "total_tokens": total},
            }
        )

    async def save_sharded_state(self, request: web.Request) -> web.Response:
        body = await _json_body(request)
        if "path" not in body:
            return _json_error("path required")
        ok, msg = await asyncio.to_thread(
            self.engine.save_sharded_state, body["path"]
        )
        return web.json_response(
            {"success": ok, "message": msg}, status=200 if ok else 400
        )

    async def update_weights_from_disk(self, request: web.Request) -> web.Response:
        body = await _json_body(request)
        if "model_path" not in body:
            return _json_error("model_path required")
        ok, msg = await asyncio.to_thread(
            self.engine.update_weights_from_disk,
            body["model_path"],
            body.get("load_format"),
        )
        return web.json_response(
            {"success": ok, "message": msg}, status=200 if ok else 400
        )

    async def init_weights_update_group(
        self, request: web.Request
    ) -> web.Response:
        """Reference `/init_weights_update_group` (RL trainer attach)."""
        body = await _json_body(request)
        if "master_address" not in body:
            return _json_error("master_address required")
        ok, msg = await asyncio.to_thread(
            self.engine.init_weights_update_group,
            body["master_address"],
            int(body.get("master_port", 0)),
            body.get("group_name", "default"),
        )
        return web.json_response(
            {"success": ok, "message": msg}, status=200 if ok else 400
        )

    async def update_weights_from_distributed(
        self, request: web.Request
    ) -> web.Response:
        body = await _json_body(request)
        if "names" not in body:
            return _json_error("names required")
        ok, msg = await asyncio.to_thread(
            self.engine.update_weights_from_distributed,
            body["names"],
            body.get("group_name", "default"),
        )
        return web.json_response(
            {"success": ok, "message": msg}, status=200 if ok else 400
        )

    async def load_lora_adapter(self, request: web.Request) -> web.Response:
        """Dynamic adapter load (reference `/load_lora_adapter`,
        `http_server.py:625-643`)."""
        body = await _json_body(request)
        if "lora_name" not in body or "lora_path" not in body:
            return _json_error("lora_name and lora_path required")
        ok, msg = await asyncio.to_thread(
            self.engine.load_lora_adapter,
            body["lora_name"],
            body["lora_path"],
        )
        return web.json_response(
            {"success": ok, "message": msg}, status=200 if ok else 400
        )

    async def unload_lora_adapter(self, request: web.Request) -> web.Response:
        body = await _json_body(request)
        if "lora_name" not in body:
            return _json_error("lora_name required")
        ok, msg = await asyncio.to_thread(
            self.engine.unload_lora_adapter, body["lora_name"]
        )
        return web.json_response(
            {"success": ok, "message": msg}, status=200 if ok else 400
        )

    async def prefill_only(self, request: web.Request) -> web.Response:
        """PD prefill-side: run prefill and either return the packed KV
        payload (legacy proxy mode) or — when the request carries a
        ``room`` + ``decode_url`` — push it DIRECTLY to the decode
        server through the selected transfer engine and return only a
        tiny ack (reference mooncake room handshake: the router never
        relays KV bytes)."""
        if self.engine.server_args.disaggregation_mode != "prefill":
            return _json_error("not a prefill server", 400)
        body = await _json_body(request)
        try:
            handoff = await asyncio.to_thread(
                self.engine.prefill_only,
                body["input_ids"],
                body.get("sampling_params"),
            )
        except Exception as e:
            return _json_error(str(e), 500)
        from sglang_npu_tpu.disaggregation import (
            encode_payload,
            get_kv_sender,
        )

        room = body.get("room")
        decode_url = body.get("decode_url")
        if room and decode_url:
            sender = get_kv_sender(body.get("transfer", "http"))
            try:
                await sender.send(
                    self._http_session(), decode_url, room, handoff
                )
            except Exception as e:
                return _json_error(f"KV transfer failed: {e}", 502)
            return web.json_response(
                {"rid": handoff.rid, "room": room, "transferred": True}
            )
        payload, headers = encode_payload(handoff)
        return web.Response(
            body=payload,
            content_type="application/octet-stream",
            headers=headers,
        )

    def _http_session(self):
        import aiohttp

        if getattr(self, "_pd_session", None) is None:
            self._pd_session = aiohttp.ClientSession()
        return self._pd_session

    def _pd_rooms(self):
        if getattr(self, "_pd_room_table", None) is None:
            from sglang_npu_tpu.disaggregation import RoomTable

            self._pd_room_table = RoomTable()
        return self._pd_room_table

    async def receive_prefill(self, request: web.Request) -> web.Response:
        """PD decode-side: accept transferred KV.  With an ``X-Room``
        header the payload is parked in the bootstrap room (ack returns
        immediately so the prefill server can free its pages) and the
        matching `/pd_register` long-poll completes the decode;
        without one, legacy inline inject+decode."""
        import json as _json

        from sglang_npu_tpu.disaggregation import decode_payload

        raw = await request.read()
        try:
            h = decode_payload(raw, request.headers)
        except Exception as e:
            return _json_error(f"bad KV payload: {e}", 400)
        room = request.headers.get("X-Room", "")
        if room:
            self._pd_rooms().deliver(room, h)
            return web.json_response({"room": room, "stored": True})
        sp = _json.loads(request.headers.get("X-Sampling-Params", "{}"))
        try:
            out = await asyncio.to_thread(self.engine.inject_decode, h, sp)
            return web.json_response(out)
        except Exception as e:
            return _json_error(str(e), 500)

    async def pd_register(self, request: web.Request) -> web.Response:
        """PD decode-side bootstrap-room registration: long-polls until
        the prefill server delivers the room's KV, then injects and
        returns the decode result (reference decode-side
        `event_loop_normal_disagg_decode` waiting on the transfer
        queue)."""
        body = await _json_body(request)
        room = body.get("room")
        if not room:
            return _json_error("missing room", 400)
        try:
            h = await self._pd_rooms().wait(
                room, timeout=float(body.get("timeout", 600))
            )
        except Exception:
            return _json_error(f"room {room} timed out", 504)
        try:
            out = await asyncio.to_thread(
                self.engine.inject_decode, h,
                body.get("sampling_params") or {},
            )
            return web.json_response(out)
        except Exception as e:
            return _json_error(str(e), 500)

    async def start_profile(self, request: web.Request) -> web.Response:
        """jax.profiler trace capture (reference `/start_profile:441`,
        torch.profiler RPC; traces are xplane/perfetto files)."""
        try:
            body = await _json_body(request)
        except Exception:
            body = {}
        out_dir = body.get("output_dir") or "/tmp/sglang_tpu_profile"
        import jax

        num_steps = body.get("num_steps")
        activities = body.get("activities") or []
        if "MEM" in activities:
            # memory profiling (reference `scheduler_profiler_mixin.py:143`
            # records CUDA allocation history; the TPU analogue snapshots
            # live-HBM pprof profiles at start and stop)
            os.makedirs(out_dir, exist_ok=True)
            self._mem_profile_dir = out_dir
            try:
                with open(
                    os.path.join(out_dir, "memory-start.pprof"), "wb"
                ) as f:
                    f.write(jax.profiler.device_memory_profile())
            except Exception as e:
                return _json_error(f"memory profile failed: {e}", 500)
            if activities == ["MEM"]:
                return web.json_response(
                    {"success": True, "output_dir": out_dir,
                     "activities": activities}
                )
        if body.get("by_stage"):
            # by-stage capture (reference --profile-by-stage): the
            # scheduler writes SEPARATE traces for the next N prefill
            # forwards (out_dir/prefill) and N decode windows
            # (out_dir/decode)
            n = int(num_steps or 3)
            for sched in getattr(self.engine, "schedulers", []):
                sched.start_stage_profile(out_dir, n)
            self._profile_dir = out_dir
            return web.json_response(
                {"success": True, "output_dir": out_dir, "by_stage": True}
            )
        try:
            jax.profiler.start_trace(out_dir)
        except Exception as e:
            return _json_error(f"profiler start failed: {e}", 500)
        if num_steps:
            # bounded capture: the scheduler stops the trace after N
            # forwards (reference /start_profile num_steps)
            for sched in getattr(self.engine, "schedulers", []):
                sched.profile_steps_remaining = int(num_steps)
        self._profile_dir = out_dir
        return web.json_response({"success": True, "output_dir": out_dir})

    async def stop_profile(self, request: web.Request) -> web.Response:
        import jax

        mem_dir = getattr(self, "_mem_profile_dir", None)
        mem_files = None
        if mem_dir is not None:
            # end-of-capture snapshot + per-device allocation stats (the
            # reference dumps the CUDA memory snapshot here,
            # `scheduler_profiler_mixin.py:193-202`)
            self._mem_profile_dir = None
            try:
                with open(
                    os.path.join(mem_dir, "memory-stop.pprof"), "wb"
                ) as f:
                    f.write(jax.profiler.device_memory_profile())
                stats = {}
                for d in jax.local_devices():
                    try:
                        stats[str(d)] = d.memory_stats()
                    except Exception:
                        pass
                with open(
                    os.path.join(mem_dir, "memory_stats.json"), "w"
                ) as f:
                    json.dump(stats, f, indent=1, default=str)
                mem_files = ["memory-start.pprof", "memory-stop.pprof",
                             "memory_stats.json"]
            except Exception as e:
                return _json_error(f"memory profile stop failed: {e}", 500)
        try:
            jax.profiler.stop_trace()
        except Exception as e:
            if mem_files is None:
                return _json_error(f"profiler stop failed: {e}", 500)
        return web.json_response(
            {"success": True,
             "output_dir": getattr(self, "_profile_dir", None),
             **({"memory_profile": mem_files, "memory_dir": mem_dir}
                if mem_files else {})}
        )

    async def open_session(self, request: web.Request) -> web.Response:
        body = await _json_body(request)
        sid = await asyncio.to_thread(
            self.engine.open_session,
            body.get("session_id"),
            body.get("capacity_of_str_len", 0),
        )
        return web.json_response({"session_id": sid})

    async def close_session(self, request: web.Request) -> web.Response:
        body = await _json_body(request)
        self.engine.close_session(body["session_id"])
        return web.Response(status=200)

    async def kv_events(self, request: web.Request) -> web.Response:
        """Drain KV cache content events (reference kv_events subscriber
        API; requires --enable-kv-cache-events).  ?since=<seq> resumes."""
        pub = getattr(self.engine.scheduler.tree_cache, "events", None)
        if pub is None:
            return _json_error("kv events not enabled", 400)
        since = int(request.query.get("since", 0))
        events = pub.take(since)
        return web.json_response({"events": events, "seq": pub.seq})

    async def expert_distribution(self, request: web.Request) -> web.Response:
        """Accumulated per-layer per-expert routed-token counts (reference
        /dump_expert_distribution_record; requires --enable-eplb)."""
        snap = self.engine.model_runner.expert_load_snapshot()
        if snap is None:
            return _json_error("EPLB not enabled", 400)
        return web.json_response({
            "counts": snap.tolist(),
            "rebalances": self.engine.model_runner.eplb_rebalance_count,
        })

    async def rebalance_experts(self, request: web.Request) -> web.Response:
        """Force an EPLB rebalance now (reference eplb_manager RPC); runs
        on the scheduler thread (it permutes live expert weights)."""
        try:
            ok, msg = await asyncio.to_thread(self.engine.rebalance_experts)
        except Exception as e:
            return _json_error(str(e), 500)
        return web.json_response({"success": bool(ok), "message": msg})

    async def pause_generation(self, request: web.Request) -> web.Response:
        ok = await asyncio.to_thread(self.engine.pause_generation)
        return web.json_response({"success": ok, "message": "paused"})

    async def continue_generation(self, request: web.Request) -> web.Response:
        ok = await asyncio.to_thread(self.engine.continue_generation)
        return web.json_response({"success": ok, "message": "continued"})

    async def release_memory(self, request: web.Request) -> web.Response:
        self.engine.release_memory_occupation()
        return web.json_response({"success": True})

    async def resume_memory(self, request: web.Request) -> web.Response:
        self.engine.resume_memory_occupation()
        return web.json_response({"success": True})

    # ------------------------------------------------------------------
    async def models(self, request: web.Request) -> web.Response:
        args = self.engine.server_args
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": args.served_model_name,
                        "object": "model",
                        "created": int(self.start_time),
                        "owned_by": "sglang_npu_tpu",
                    }
                ],
            }
        )

    async def v1_score(self, request: web.Request) -> web.Response:
        """Score items against a query (reference `/v1/score:838`): mean
        per-token logprob of each item continuation after the query."""
        body = await _json_body(request)
        query = body.get("query")
        items = body.get("items")
        if query is None or not isinstance(items, list):
            return _json_error("query and items (list) required")
        tok = self.tm.tokenizer
        if tok is None:
            return _json_error("scoring requires a tokenizer", 400)

        def score_one(item: str):
            ids_q = tok.encode(query)
            ids_full = tok.encode(query + item)
            out = self.engine.generate(
                input_ids=ids_full,
                sampling_params={"max_new_tokens": 0, "temperature": 0.0},
                return_logprob=True,
                logprob_start_len=len(ids_q),
            )
            entries = out["meta_info"].get("input_token_logprobs", [])
            n = max(len(entries), 1)
            return sum(e[0] for e in entries) / n

        scores = await asyncio.to_thread(lambda: [score_one(i) for i in items])
        return web.json_response(
            {"object": "scoring", "model": body.get("model", "default"), "scores": scores}
        )

    async def v1_rerank(self, request: web.Request) -> web.Response:
        """Rerank documents for a query (reference `/v1/rerank:847`):
        embedding-mode servers use cosine similarity of pooled embeddings;
        generation servers fall back to logprob scoring."""
        body = await _json_body(request)
        query = body.get("query")
        docs = body.get("documents")
        if query is None or not isinstance(docs, list):
            return _json_error("query and documents (list) required")
        import numpy as _np

        if self.engine.server_args.is_embedding:
            outs = await asyncio.to_thread(self.engine.encode, [query] + docs)
            embs = [_np.asarray(o["embedding"]) for o in outs]
            qv = embs[0]
            scores = [float(qv @ d) for d in embs[1:]]
        else:
            tok = self.tm.tokenizer
            if tok is None:
                return _json_error("rerank requires a tokenizer", 400)

            def score_one(doc: str):
                ids_q = tok.encode(query)
                ids_full = tok.encode(query + " " + doc)
                out = self.engine.generate(
                    input_ids=ids_full,
                    sampling_params={"max_new_tokens": 0, "temperature": 0.0},
                    return_logprob=True,
                    logprob_start_len=len(ids_q),
                )
                entries = out["meta_info"].get("input_token_logprobs", [])
                return sum(e[0] for e in entries) / max(len(entries), 1)

            scores = await asyncio.to_thread(
                lambda: [score_one(d) for d in docs]
            )
        ranked = sorted(
            (
                {"index": i, "document": d, "relevance_score": s}
                for i, (d, s) in enumerate(zip(docs, scores))
            ),
            key=lambda x: -x["relevance_score"],
        )
        return web.json_response(
            {"object": "rerank", "model": body.get("model", "default"), "results": ranked}
        )

    async def v1_completions(self, request: web.Request) -> web.StreamResponse:
        return await self.completion_serving.handle(request)

    async def v1_chat_completions(self, request: web.Request) -> web.StreamResponse:
        return await self.chat_serving.handle(request)


def _warmup(engine, server_args: ServerArgs):
    """Pre-bind warmup generate (reference `srt/warmup.py:56` +
    launch_server's wait_until_ready request): compiles the common
    extend/decode buckets so the first real request doesn't pay the
    first-trace latency.  Failures are non-fatal."""
    import time as _t

    t0 = _t.time()
    try:
        if server_args.is_embedding or (
            server_args.disaggregation_mode == "prefill"
        ):
            return
        sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
        if engine.tokenizer is None:
            engine.generate(input_ids=[[5, 9, 11, 7]], sampling_params=sp)
        else:
            engine.generate("The capital city of France is", sp)
        logger.info("warmup complete in %.1fs", _t.time() - t0)
    except Exception:
        logger.exception("warmup failed (continuing)")


def launch_server(server_args: ServerArgs):
    """Blocking server launch (reference `launch_server`)."""
    from sglang_npu_tpu.entrypoints.engine import Engine

    logging.basicConfig(level=getattr(logging, server_args.log_level.upper(), 20))
    engine = Engine(server_args)
    if not server_args.skip_server_warmup:
        _warmup(engine, server_args)
    server = HttpServer(engine)
    app = server.build_app()
    logger.info("serving on %s", server_args.url())
    try:
        web.run_app(
            app, host=server_args.host, port=server_args.port, print=None
        )
    finally:
        engine.shutdown()
