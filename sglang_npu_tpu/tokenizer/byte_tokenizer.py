"""Self-contained byte-level tokenizer.

Used when no HF tokenizer files are available (offline CI, dummy-weight perf
runs — the analogue of the reference's dummy/warmup paths).  ids 0..255 are
raw bytes; specials follow.  Implements the subset of the HF tokenizer
interface the engine touches (`encode`, `decode`, `eos_token_id`,
`vocab_size`, `convert_ids_to_tokens`).
"""

from __future__ import annotations

from typing import List, Optional, Union


class ByteTokenizer:
    def __init__(self, vocab_size: int = 512):
        self.vocab_size = max(vocab_size, 260)
        self.bos_token_id = 256
        self.eos_token_id = 257
        self.pad_token_id = 258
        self.unk_token_id = 259
        self.all_special_ids = {256, 257, 258, 259}
        self.bos_token = "<s>"
        self.eos_token = "</s>"
        self.name_or_path = "byte-tokenizer"

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids = list(text.encode("utf-8"))
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return ids

    def decode(
        self,
        ids,
        skip_special_tokens: bool = True,
        spaces_between_special_tokens: bool = True,
    ) -> str:
        out = bytearray()
        for i in ids:
            i = int(i)
            if i < 256:
                out.append(i)
            elif not skip_special_tokens:
                name = {256: "<s>", 257: "</s>", 258: "<pad>", 259: "<unk>"}.get(
                    i, f"<extra_{i}>"
                )
                out.extend(name.encode())
        return out.decode("utf-8", errors="replace")

    def convert_ids_to_tokens(self, ids) -> List[str]:
        return [self.decode([i], skip_special_tokens=False) for i in ids]

    def __call__(self, text, **kw):
        return {"input_ids": self.encode(text)}


def get_tokenizer(tokenizer_path: str, tokenizer_mode: str = "auto", **kw):
    """Load a tokenizer: HF AutoTokenizer if files exist, byte fallback.

    (Reference: `srt/hf_transformers_utils.py get_tokenizer`.)
    """
    import os

    if tokenizer_mode == "byte" or not tokenizer_path:
        return ByteTokenizer()
    has_files = any(
        os.path.exists(os.path.join(tokenizer_path, f))
        for f in ("tokenizer.json", "tokenizer.model", "tokenizer_config.json")
    )
    if not has_files:
        return ByteTokenizer()
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        tokenizer_path, trust_remote_code=kw.get("trust_remote_code", False)
    )
