"""Choices-scoring methods for `select` (reference `lang/choices.py`).

Each method receives, per option, the prompt-conditioned token logprobs of
the option continuation, and picks a winner:

  * token_length_normalized — highest mean token logprob (default)
  * greedy_token — column-wise greedy elimination over the logprob matrix
    (shorter options are padded with their mean logprob), reference
    `GreedyTokenSelection`
  * unconditional_likelihood_normalized — mean of (conditional −
    unconditional) token logprobs; needs a second, promptless scoring pass
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class ChoicesDecision:
    decision: str
    meta_info: Optional[Dict[str, Any]] = None


class ChoicesSamplingMethod:
    requires_unconditional_logprobs = False

    def __call__(self, *, choices, token_logprobs, unconditional_logprobs=None):
        raise NotImplementedError


class TokenLengthNormalized(ChoicesSamplingMethod):
    def __call__(self, *, choices, token_logprobs, unconditional_logprobs=None):
        normalized = [
            float(np.mean(lp)) if len(lp) else -np.inf for lp in token_logprobs
        ]
        best = int(np.argmax(normalized))
        return ChoicesDecision(
            decision=choices[best],
            meta_info={"normalized_prompt_logprobs": normalized},
        )


class GreedyTokenSelection(ChoicesSamplingMethod):
    def __call__(self, *, choices, token_logprobs, unconditional_logprobs=None):
        n = len(choices)
        max_tokens = max(len(lp) for lp in token_logprobs)
        m = np.zeros((n, max_tokens))
        for i, lp in enumerate(token_logprobs):
            avg = float(np.mean(lp)) if len(lp) else -np.inf
            m[i, : len(lp)] = lp
            if len(lp) < max_tokens:
                m[i, len(lp) :] = avg
        remaining = np.arange(n)
        for j in range(max_tokens):
            best = np.max(m[remaining, j])
            remaining = remaining[m[remaining, j] == best]
            if len(remaining) == 1:
                break
        return ChoicesDecision(
            decision=choices[int(remaining[0])],
            meta_info={"greedy_logprob_matrix": m.tolist()},
        )


class UnconditionalLikelihoodNormalized(ChoicesSamplingMethod):
    requires_unconditional_logprobs = True

    def __call__(self, *, choices, token_logprobs, unconditional_logprobs=None):
        assert unconditional_logprobs is not None
        normalized = []
        for cond, uncond in zip(token_logprobs, unconditional_logprobs):
            u = list(uncond)
            if u and u[0] is None:
                u[0] = 0.0
            u = u + [0.0] * (len(cond) - len(u))
            diff = [c - (x or 0.0) for c, x in zip(cond, u)]
            normalized.append(float(np.mean(diff)) if diff else -np.inf)
        best = int(np.argmax(normalized))
        return ChoicesDecision(
            decision=choices[best],
            meta_info={"unconditional_normalized_logprobs": normalized},
        )


CHOICES_METHODS: Dict[str, ChoicesSamplingMethod] = {
    "token_length_normalized": TokenLengthNormalized(),
    "greedy_token": GreedyTokenSelection(),
    "greedy_token_selection": GreedyTokenSelection(),
    "unconditional_likelihood_normalized": UnconditionalLikelihoodNormalized(),
}
