"""/v1/completions serving (reference `serving_completions.py:425`)."""

from __future__ import annotations

import json
import logging

from aiohttp import web

from sglang_npu_tpu.entrypoints.openai.protocol import (
    CompletionRequest,
    UsageInfo,
    ValidationError,
    completion_response,
    gen_request_id,
    map_finish_reason,
)
from sglang_npu_tpu.managers.io_struct import GenerateReqInput

logger = logging.getLogger(__name__)


class CompletionServing:
    def __init__(self, engine):
        self.engine = engine
        self.tm = engine.tokenizer_manager

    async def handle(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
            req = CompletionRequest.from_dict(body)
        except ValidationError as e:
            return web.json_response(
                {"error": {"message": str(e), "type": "invalid_request_error"}},
                status=400,
            )
        except Exception:
            return web.json_response(
                {"error": {"message": "invalid JSON body"}}, status=400
            )

        rid = gen_request_id("cmpl")
        prompt = req.prompt
        if req.suffix and isinstance(prompt, str):
            # fill-in-the-middle: render the model family's FIM format
            # (reference code_completion_parser.generate_completion_prompt)
            from sglang_npu_tpu.code_completion import build_fim_prompt

            sa = self.engine.server_args
            try:
                prompt = build_fim_prompt(
                    prompt, req.suffix, sa.model_path, sa.completion_template
                )
            except ValueError as e:
                return web.json_response(
                    {"error": {"message": str(e)}}, status=400
                )
        kwargs = {}
        if isinstance(prompt, str):
            kwargs["text"] = prompt
        elif prompt and isinstance(prompt[0], int):
            kwargs["input_ids"] = prompt
        elif prompt and isinstance(prompt[0], str):
            kwargs["text"] = prompt  # batch of strings
        else:
            kwargs["input_ids"] = prompt

        want_lp = req.logprobs is not None
        obj = GenerateReqInput(
            sampling_params=req.to_sampling_params(),
            stream=req.stream,
            rid=rid if isinstance(prompt, str) or (prompt and isinstance(prompt[0], int)) else None,
            return_logprob=want_lp,
            top_logprobs_num=int(req.logprobs or 0) if want_lp else 0,
            logprob_start_len=0 if (want_lp and req.echo) else -1,
            **kwargs,
        )

        if req.stream:
            if req.n > 1:
                return web.json_response(
                    {"error": {"message": "n>1 with stream is not supported"}},
                    status=400,
                )
            return await self._stream(request, req, obj, rid)

        if req.n > 1 and not isinstance(prompt, str):
            return web.json_response(
                {"error": {"message": "n>1 needs a single string prompt"}},
                status=400,
            )

        async def _run(o):
            out = []
            async for chunk in self.tm.generate_request(o):
                out.append(chunk)
            return out

        try:
            if req.n > 1:
                # fan out n requests; the shared prompt is one radix entry
                import asyncio as _asyncio
                import dataclasses as _dc

                objs = [obj] + [
                    _dc.replace(obj, rid=f"{rid}-{i}")
                    for i in range(1, req.n)
                ]
                finals = [
                    rs[-1] for rs in await _asyncio.gather(
                        *[_run(o) for o in objs]
                    )
                ]
            else:
                results = await _run(obj)
                finals = [results[-1]] if obj.is_single else results
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        choices, usage = [], UsageInfo()
        for i, r in enumerate(finals):
            meta = r["meta_info"]
            text = r.get("text", "")
            if req.echo and isinstance(prompt, str):
                text = prompt + text
            choices.append(
                {
                    "index": i,
                    "text": text,
                    "logprobs": (
                        self._logprobs_obj(meta, req.echo) if want_lp else None
                    ),
                    "finish_reason": map_finish_reason(meta["finish_reason"]),
                }
            )
            usage.prompt_tokens += meta["prompt_tokens"]
            usage.completion_tokens += meta["completion_tokens"]
        if req.n > 1:
            # the shared prompt is billed once (OpenAI semantics)
            usage.prompt_tokens = finals[0]["meta_info"]["prompt_tokens"]
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return web.json_response(
            completion_response(rid, req.model, choices, usage)
        )

    def _logprobs_obj(self, meta, echo: bool):
        """OpenAI completions `logprobs` object (reference serving path):
        token strings + per-token logprobs (+top alternatives), echoing
        prompt-token logprobs when `echo` (the sgl.select scoring path)."""
        tokenizer = getattr(self.engine, "tokenizer", None)

        def tok_str(tid):
            if tokenizer is None:
                return str(int(tid))
            try:
                return tokenizer.decode([int(tid)])
            except Exception:
                return str(int(tid))

        entries = []
        if echo:
            entries += meta.get("input_token_logprobs") or []
        entries += meta.get("output_token_logprobs") or []
        tokens = [tok_str(e[1]) for e in entries]
        tlp = [float(e[0]) if e[0] is not None else None for e in entries]
        tops_raw = meta.get("output_top_logprobs") or []
        top_logprobs = None
        if tops_raw:
            tops = [
                {tok_str(t): float(v) for v, t, _ in row} for row in tops_raw
            ]
            top_logprobs = [None] * (len(entries) - len(tops)) + tops
        return {
            "tokens": tokens,
            "token_logprobs": tlp,
            "top_logprobs": top_logprobs,
            "text_offset": None,
        }

    async def _stream(self, request, req, obj, rid) -> web.StreamResponse:
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        sent_len = 0
        usage = UsageInfo()
        try:
            async for chunk in self.tm.generate_request(obj):
                meta = chunk["meta_info"]
                delta = chunk["text"][sent_len:]
                sent_len = len(chunk["text"])
                data = {
                    "id": rid,
                    "object": "text_completion",
                    "created": int(__import__("time").time()),
                    "model": req.model,
                    "choices": [
                        {
                            "index": 0,
                            "text": delta,
                            "logprobs": None,
                            "finish_reason": map_finish_reason(meta["finish_reason"]),
                        }
                    ],
                }
                usage.prompt_tokens = meta["prompt_tokens"]
                usage.completion_tokens = meta["completion_tokens"]
                await resp.write(b"data: " + json.dumps(data).encode() + b"\n\n")
            if req.stream_options and req.stream_options.get("include_usage"):
                usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
                await resp.write(
                    b"data: "
                    + json.dumps(
                        {
                            "id": rid,
                            "object": "text_completion",
                            "model": req.model,
                            "choices": [],
                            "usage": usage.to_dict(),
                        }
                    ).encode()
                    + b"\n\n"
                )
            await resp.write(b"data: [DONE]\n\n")
        except Exception as e:
            logger.exception("completion stream error")
            await resp.write(
                b"data: " + json.dumps({"error": {"message": str(e)}}).encode() + b"\n\n"
            )
        await resp.write_eof()
        return resp
