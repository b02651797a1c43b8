"""Third-party lang backends (reference `lang/backend/openai.py`,
`anthropic.py`, `litellm.py`): run sgl programs against external
chat-completion APIs.  Plain urllib clients — no SDK dependencies — so
they also serve as OpenAI-protocol clients against this engine's own
server (which is how the tests exercise them without network egress).
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Any, Dict, List, Optional


def _post_json(url: str, payload: dict, headers: dict, timeout: float):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **headers},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _map_params(sampling_params: Dict[str, Any]) -> Dict[str, Any]:
    sp = sampling_params or {}
    out = {"max_tokens": sp.get("max_new_tokens", 128)}
    if "temperature" in sp:
        out["temperature"] = sp["temperature"]
    if "top_p" in sp:
        out["top_p"] = sp["top_p"]
    if sp.get("stop"):
        out["stop"] = sp["stop"]
    return out


class OpenAIBackend:
    """Chat-completions client (reference `lang/backend/openai.py`).

    `select` scoring uses the legacy completions endpoint with
    echo+logprobs when the server supports it (this engine's own
    /v1/completions does)."""

    def __init__(
        self,
        model: str,
        base_url: str = "https://api.openai.com/v1",
        api_key: Optional[str] = None,
        timeout: float = 600.0,
    ):
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "")
        self.timeout = timeout
        self.tokenizer = None  # prompts stay text; server tokenizes

    def _headers(self):
        h = {}
        if self.api_key:
            h["Authorization"] = f"Bearer {self.api_key}"
        return h

    def generate(
        self, prompt: str, sampling_params: Dict[str, Any], image_data=None
    ) -> str:
        content: Any = prompt
        if image_data:
            content = [{"type": "text", "text": prompt}] + [
                {"type": "image_url", "image_url": {"url": u}}
                for u in (
                    image_data if isinstance(image_data, list) else [image_data]
                )
            ]
        out = _post_json(
            self.base_url + "/chat/completions",
            {
                "model": self.model,
                "messages": [{"role": "user", "content": content}],
                **_map_params(sampling_params),
            },
            self._headers(),
            self.timeout,
        )
        return out["choices"][0]["message"]["content"] or ""

    def score(self, prompt: str, continuation: str) -> List[float]:
        out = _post_json(
            self.base_url + "/completions",
            {
                "model": self.model,
                "prompt": prompt + continuation,
                "max_tokens": 0,
                "echo": True,
                "logprobs": 1,
            },
            self._headers(),
            self.timeout,
        )
        lp = out["choices"][0].get("logprobs") or {}
        toks = lp.get("token_logprobs") or []
        return [x for x in toks if x is not None]


class AnthropicBackend:
    """Messages-API client (reference `lang/backend/anthropic.py`).
    Anthropic exposes no token logprobs, so `select` is unsupported —
    same limitation as the reference backend."""

    def __init__(
        self,
        model: str,
        base_url: str = "https://api.anthropic.com",
        api_key: Optional[str] = None,
        timeout: float = 600.0,
    ):
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key or os.environ.get("ANTHROPIC_API_KEY", "")
        self.timeout = timeout
        self.tokenizer = None

    def generate(
        self, prompt: str, sampling_params: Dict[str, Any], image_data=None
    ) -> str:
        sp = _map_params(sampling_params)
        out = _post_json(
            self.base_url + "/v1/messages",
            {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "max_tokens": sp.get("max_tokens", 128),
                **{
                    k: v
                    for k, v in sp.items()
                    if k in ("temperature", "top_p", "stop_sequences")
                },
            },
            {
                "x-api-key": self.api_key,
                "anthropic-version": "2023-06-01",
            },
            self.timeout,
        )
        parts = out.get("content", [])
        return "".join(p.get("text", "") for p in parts)

    def score(self, prompt: str, continuation: str) -> List[float]:
        raise NotImplementedError(
            "the Anthropic API exposes no token logprobs; sgl.select needs "
            "a logprob-capable backend (Engine/RuntimeEndpoint/OpenAI)"
        )


class LiteLLMBackend(OpenAIBackend):
    """LiteLLM proxy client (reference `lang/backend/litellm.py`): the
    proxy speaks the OpenAI wire protocol for any upstream provider, so
    this is the OpenAI client pointed at the proxy URL."""

    def __init__(
        self,
        model: str,
        base_url: str = "http://localhost:4000/v1",
        api_key: Optional[str] = None,
        timeout: float = 600.0,
    ):
        super().__init__(
            model,
            base_url=base_url,
            api_key=api_key or os.environ.get("LITELLM_API_KEY", ""),
            timeout=timeout,
        )


class VertexAIBackend:
    """Google Vertex AI generateContent client (reference
    `lang/backend/vertexai.py`): bearer token from
    GOOGLE_APPLICATION_ACCESS_TOKEN (or an explicit ``access_token``),
    prompts map to a single-user `contents` turn, images ride as
    inlineData parts.  `select` scoring is not exposed by the Vertex API
    (same limitation as the reference backend)."""

    def __init__(
        self,
        model: str,
        project: str = None,
        location: str = "us-central1",
        access_token: str = None,
        timeout: float = 600.0,
    ):
        self.model = model
        self.project = project or os.environ.get("GCP_PROJECT", "")
        self.location = location
        self.access_token = access_token or os.environ.get(
            "GOOGLE_APPLICATION_ACCESS_TOKEN", ""
        )
        self.timeout = timeout
        self.tokenizer = None
        self.base_url = (
            f"https://{location}-aiplatform.googleapis.com/v1/projects/"
            f"{self.project}/locations/{location}/publishers/google/models"
        )

    def generate(
        self, prompt: str, sampling_params: Dict[str, Any], image_data=None
    ) -> str:
        parts = [{"text": prompt}]
        for u in (
            image_data
            if isinstance(image_data, list)
            else ([image_data] if image_data else [])
        ):
            parts.append(
                {"inlineData": {"mimeType": "image/jpeg", "data": u}}
            )
        cfg = {}
        mp = _map_params(sampling_params)
        if "max_tokens" in mp:
            cfg["maxOutputTokens"] = mp["max_tokens"]
        if "temperature" in mp:
            cfg["temperature"] = mp["temperature"]
        if "top_p" in mp:
            cfg["topP"] = mp["top_p"]
        if "stop" in mp:
            cfg["stopSequences"] = mp["stop"]
        out = _post_json(
            f"{self.base_url}/{self.model}:generateContent",
            {
                "contents": [{"role": "user", "parts": parts}],
                "generationConfig": cfg,
            },
            {"Authorization": f"Bearer {self.access_token}"},
            self.timeout,
        )
        cands = out.get("candidates") or []
        if not cands:
            return ""
        return "".join(
            p.get("text", "")
            for p in cands[0].get("content", {}).get("parts", [])
        )

    def score(self, prompt: str, continuation: str):
        raise NotImplementedError(
            "Vertex AI exposes no token-logprob scoring API"
        )
