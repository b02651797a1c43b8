"""/v1/chat/completions serving (reference `serving_chat.py:980`).

Applies the model's chat template (HF tokenizer template when available, a
plain role-prefix template otherwise), streams SSE chunks, and fills usage.
Tool-call and reasoning-content extraction hook in here (function_call /
reasoning_parser modules).
"""

from __future__ import annotations

import json
import logging
import time

from aiohttp import web

from sglang_npu_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest,
    UsageInfo,
    ValidationError,
    chat_response,
    gen_request_id,
    map_finish_reason,
)
from sglang_npu_tpu.managers.io_struct import GenerateReqInput

logger = logging.getLogger(__name__)


def apply_chat_template(
    tokenizer, messages, add_generation_prompt=True,
    template_name=None, model_path="",
):
    """Render messages -> (prompt, extra_stop_strs).

    Resolution order (reference TemplateManager): an explicit
    ``--chat-template`` (named or JSON file) wins; else the HF tokenizer's
    jinja template; else a model-path match against the named registry
    (`conversation.py`); else a plain role-prefixed fallback."""
    from sglang_npu_tpu.conversation import (
        load_template,
        match_model_template,
    )

    if template_name:
        conv = load_template(template_name)
        return (
            conv.render(messages, add_generation_prompt), list(conv.stop_strs)
        )
    if tokenizer is not None and hasattr(tokenizer, "apply_chat_template"):
        try:
            return tokenizer.apply_chat_template(
                messages,
                tokenize=False,
                add_generation_prompt=add_generation_prompt,
            ), []
        except Exception:
            pass
    conv = match_model_template(model_path) if model_path else None
    if conv is not None:
        return (
            conv.render(messages, add_generation_prompt), list(conv.stop_strs)
        )
    # Fallback plain template (byte tokenizer / template-less models).
    parts = []
    for m in messages:
        content = m.get("content") or ""
        if isinstance(content, list):  # multimodal form: concat text parts
            content = "".join(
                p.get("text", "") for p in content if p.get("type") == "text"
            )
        parts.append(f"{m['role']}: {content}")
    if add_generation_prompt:
        parts.append("assistant:")
    return "\n".join(parts), []


class ChatServing:
    def __init__(self, engine):
        self.engine = engine
        self.tm = engine.tokenizer_manager

    async def handle(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
            req = ChatCompletionRequest.from_dict(body)
        except ValidationError as e:
            return web.json_response(
                {"error": {"message": str(e), "type": "invalid_request_error"}},
                status=400,
            )
        except Exception:
            return web.json_response(
                {"error": {"message": "invalid JSON body"}}, status=400
            )

        rid = gen_request_id("chatcmpl")
        # Pull multimodal parts out of the messages (OpenAI image_url
        # content blocks -> engine image_data; data: URIs / base64 only —
        # no egress in this environment)
        images = []
        videos = []
        for m in req.messages:
            content = m.get("content")
            if isinstance(content, list):
                for p in content:
                    if p.get("type") == "image_url":
                        url = p.get("image_url")
                        if isinstance(url, dict):
                            url = url.get("url")
                        if url:
                            images.append(url)
                    elif p.get("type") == "video_url":
                        # frames as data: URIs / base64 / a .npy path
                        # (no codecs in this environment)
                        v = p.get("video_url")
                        if isinstance(v, dict):
                            v = v.get("url") or v.get("frames")
                        if v is not None:
                            videos.append(v)
        sa = self.engine.server_args
        prompt, extra_stops = apply_chat_template(
            self.tm.tokenizer, req.messages,
            template_name=sa.chat_template, model_path=sa.model_path,
        )
        sp = req.to_sampling_params()
        # tool_choice "required" / named function -> constrain decoding to
        # valid tool-call syntax for the configured --tool-call-parser
        # (reference FunctionCallParser.get_structure_constraint)
        if req.tools and not (
            sp.get("regex") or sp.get("json_schema") or sp.get("ebnf")
        ):
            from sglang_npu_tpu.function_call.tool_constraint import (
                build_tool_constraint,
            )

            constraint = build_tool_constraint(
                req.tools, req.tool_choice, sa.tool_call_parser
            )
            if constraint is not None:
                sp[constraint[0]] = constraint[1]
        if extra_stops:
            stop = sp.get("stop")
            stop = (
                [stop] if isinstance(stop, str) else list(stop or [])
            )
            sp["stop"] = stop + [s for s in extra_stops if s not in stop]
        obj = GenerateReqInput(
            text=prompt,
            sampling_params=sp,
            stream=req.stream,
            rid=rid,
            image_data=images or None,
            video_data=videos or None,
        )

        if req.stream:
            return await self._stream(request, req, obj, rid)

        # n>1: fan out n engine requests (the shared prompt prefix is one
        # radix-cache entry; sampling noise differs per row) — reference
        # serving_chat n handling
        import asyncio as _asyncio
        import dataclasses as _dc

        async def _collect(o):
            last = None
            async for chunk in self.tm.generate_request(o):
                last = chunk
            return last

        objs = [obj]
        for i in range(1, req.n):
            objs.append(_dc.replace(obj, rid=f"{rid}-{i}"))
        try:
            lasts = await _asyncio.gather(*[_collect(o) for o in objs])
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)

        usage = UsageInfo()
        choices = []
        for i, last in enumerate(lasts):
            meta = last["meta_info"]
            text = last.get("text", "")
            reasoning = None
            if req.separate_reasoning:
                from sglang_npu_tpu.reasoning_parser import split_reasoning

                reasoning, text = split_reasoning(
                    text, self.engine.server_args.reasoning_parser
                )
            message = {"role": "assistant", "content": text}
            if reasoning:
                message["reasoning_content"] = reasoning
            tool_calls = None
            if req.tools and req.tool_choice != "none":
                from sglang_npu_tpu.function_call.parser import (
                    parse_tool_calls,
                )

                tool_calls, text_rest = parse_tool_calls(
                    text,
                    self.engine.server_args.tool_call_parser,
                    tools=req.tools,
                )
                if tool_calls:
                    message["content"] = text_rest or None
                    message["tool_calls"] = tool_calls
            usage.prompt_tokens = meta["prompt_tokens"]
            usage.completion_tokens += meta["completion_tokens"]
            if meta.get("cached_tokens"):
                usage.prompt_tokens_details = {
                    "cached_tokens": meta.get("cached_tokens", 0)
                }
            finish = (
                "tool_calls"
                if tool_calls
                else map_finish_reason(meta["finish_reason"])
            )
            choices.append({
                "index": i,
                "message": message,
                "logprobs": None,
                "finish_reason": finish,
            })
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return web.json_response(chat_response(rid, req.model, choices, usage))

    async def _stream(self, request, req, obj, rid) -> web.StreamResponse:
        if req.n > 1:
            return web.json_response(
                {"error": {"message": "n>1 with stream is not supported"}},
                status=400,
            )
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        sent_len = 0
        first = True
        usage = UsageInfo()
        # streaming tool-call detection (reference streaming detectors +
        # partial-json): content before a marker streams as text; the call
        # name arrives as its own delta, arguments as raw JSON fragments
        tool_parser = None
        if req.tools and req.tool_choice != "none":
            from sglang_npu_tpu.function_call.detectors import get_detector
            from sglang_npu_tpu.function_call.streaming import (
                StreamingToolCallParser,
            )

            det = get_detector(self.engine.server_args.tool_call_parser)
            if det is not None:
                tool_parser = det.streaming()
                tool_parser.tools = req.tools
            else:
                tool_parser = StreamingToolCallParser()

        async def _write(deltas, meta, final=False):
            nonlocal first
            for d in deltas:
                delta = dict(d)
                if first:
                    delta["role"] = "assistant"
                    first = False
                fin = meta["finish_reason"] if final else None
                data = {
                    "id": rid,
                    "object": "chat.completion.chunk",
                    "created": int(time.time()),
                    "model": req.model,
                    "choices": [{
                        "index": 0,
                        "delta": delta,
                        "finish_reason": map_finish_reason(fin),
                    }],
                }
                await resp.write(
                    b"data: " + json.dumps(data).encode() + b"\n\n"
                )

        meta = {"finish_reason": None, "prompt_tokens": 0,
                "completion_tokens": 0}
        try:
            async for chunk in self.tm.generate_request(obj):
                meta = chunk["meta_info"]
                delta_text = chunk["text"][sent_len:]
                sent_len = len(chunk["text"])
                if tool_parser is not None:
                    deltas = tool_parser.feed(delta_text)
                else:
                    deltas = [{"content": delta_text}] if delta_text else []
                if first and not deltas:
                    deltas = [{}]
                usage.prompt_tokens = meta["prompt_tokens"]
                usage.completion_tokens = meta["completion_tokens"]
                await _write(deltas, meta)
            if tool_parser is not None:
                tail = tool_parser.finish()
                if tail:
                    await _write(tail, meta)
                if tool_parser.saw_tool_call:
                    meta = dict(meta)
                    meta["finish_reason"] = {"type": "tool_calls"}
            # final chunk carries the finish_reason
            await _write([{}], meta, final=True)
            if req.stream_options and req.stream_options.get("include_usage"):
                usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
                await resp.write(
                    b"data: "
                    + json.dumps(
                        {
                            "id": rid,
                            "object": "chat.completion.chunk",
                            "model": req.model,
                            "choices": [],
                            "usage": usage.to_dict(),
                        }
                    ).encode()
                    + b"\n\n"
                )
            await resp.write(b"data: [DONE]\n\n")
        except Exception as e:
            logger.exception("chat stream error")
            await resp.write(
                b"data: " + json.dumps({"error": {"message": str(e)}}).encode() + b"\n\n"
            )
        await resp.write_eof()
        return resp
