"""Typed messages between tokenizer, scheduler, and detokenizer.

Wire-protocol parity with the reference's `srt/managers/io_struct.py`
(`GenerateReqInput:64`, `TokenizedGenerateReqInput:482`, `BatchTokenIDOut:661`,
`BatchStrOut:714`, RPC dataclasses).  On TPU these travel over in-process
queues within one host and (multi-host) over a ZMQ control plane; all are
plain picklable dataclasses.
"""

from __future__ import annotations

import dataclasses
import uuid
from enum import Enum
from typing import Any, Dict, List, Optional, Union

from sglang_npu_tpu.sampling.sampling_params import SamplingParams


# ----------------------------------------------------------------------
# Client-facing request input (pre-tokenization)
# ----------------------------------------------------------------------
@dataclasses.dataclass
class GenerateReqInput:
    # Either text or input_ids (or both lists for batch requests).
    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None
    sampling_params: Optional[Union[Dict, List[Dict]]] = None
    rid: Optional[Union[str, List[str]]] = None
    return_logprob: bool = False
    logprob_start_len: int = -1
    top_logprobs_num: int = 0
    token_ids_logprob: Optional[List[int]] = None
    stream: bool = False
    lora_path: Optional[Union[str, List[str]]] = None
    session_params: Optional[Dict] = None
    custom_logit_processor: Optional[str] = None
    return_hidden_states: bool = False
    # multimodal: one image / list of images (single request) or a list
    # parallel to text (batch). Accepted forms: PIL, path, bytes, base64,
    # data: URI (reference GenerateReqInput.image_data)
    image_data: Optional[Any] = None
    # video frames: [T, H, W, 3] arrays / frame lists / .npy paths
    # (reference GenerateReqInput.video_data; no codecs in this env)
    video_data: Optional[Any] = None
    # multimodal audio: raw waveform (list/np array at the model's
    # sampling rate) or a path, single or batch-parallel list
    # (reference GenerateReqInput.audio_data)
    audio_data: Optional[Any] = None

    def post_init(self):
        if self.text is None and self.input_ids is None:
            raise ValueError("Either text or input_ids must be provided")
        if self.text is not None and self.input_ids is not None:
            raise ValueError("Provide only one of text or input_ids")
        self.is_single = not (
            isinstance(self.text, list) or (self.input_ids and isinstance(self.input_ids[0], list))
        )
        if self.is_single:
            if self.rid is None:
                self.rid = uuid.uuid4().hex

    def batch_size(self) -> int:
        if self.is_single:
            return 1
        return len(self.text) if self.text is not None else len(self.input_ids)


@dataclasses.dataclass
class EmbeddingReqInput:
    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None
    rid: Optional[Union[str, List[str]]] = None
    is_cross_encoder_request: bool = False

    def post_init(self):
        if self.text is None and self.input_ids is None:
            raise ValueError("Either text or input_ids must be provided")
        self.is_single = not (
            isinstance(self.text, list) or (self.input_ids and isinstance(self.input_ids[0], list))
        )
        if self.is_single and self.rid is None:
            self.rid = uuid.uuid4().hex


# ----------------------------------------------------------------------
# Tokenizer -> Scheduler
# ----------------------------------------------------------------------
@dataclasses.dataclass
class TokenizedGenerateReqInput:
    rid: str
    input_text: Optional[str]
    input_ids: List[int]
    sampling_params: SamplingParams
    return_logprob: bool = False
    logprob_start_len: int = -1
    top_logprobs_num: int = 0
    token_ids_logprob: Optional[List[int]] = None
    stream: bool = False
    lora_path: Optional[str] = None
    session_params: Optional[Dict] = None
    custom_logit_processor: Optional[str] = None
    return_hidden_states: bool = False
    # multimodal payload from multimodal/processor.process_images:
    # {input_ids, key_ids, pixel_values, image_grid_thw, mrope_positions,
    #  mrope_delta, image_token_id}
    mm_inputs: Optional[Dict] = None


@dataclasses.dataclass
class TokenizedEmbeddingReqInput:
    rid: str
    input_text: Optional[str]
    input_ids: List[int]


# ----------------------------------------------------------------------
# Scheduler -> Detokenizer -> Tokenizer
# ----------------------------------------------------------------------
@dataclasses.dataclass
class BatchTokenIDOut:
    rids: List[str]
    finished_reasons: List[Optional[Dict]]
    decoded_texts: List[str]  # already-decoded prefix (for incremental decode)
    decode_ids: List[List[int]]  # full output ids so far
    read_offsets: List[int]
    output_ids: List[List[int]]  # new tokens this step
    skip_special_tokens: List[bool]
    spaces_between_special_tokens: List[bool]
    no_stop_trim: List[bool]
    prompt_tokens: List[int]
    completion_tokens: List[int]
    cached_tokens: List[int]
    input_token_logprobs: List[Optional[list]] = None
    output_token_logprobs: List[Optional[list]] = None
    input_top_logprobs: List[Optional[list]] = None
    output_top_logprobs: List[Optional[list]] = None
    spec_accepted_tokens: List[int] = dataclasses.field(default_factory=list)
    # per-request stage timings, set when finished (reference TimeStats)
    time_stats: List[Optional[Dict]] = None


@dataclasses.dataclass
class BatchStrOut:
    rids: List[str]
    finished_reasons: List[Optional[Dict]]
    output_strs: List[str]
    output_ids: List[List[int]]
    prompt_tokens: List[int]
    completion_tokens: List[int]
    cached_tokens: List[int]
    input_token_logprobs: List[Optional[list]] = None
    output_token_logprobs: List[Optional[list]] = None
    input_top_logprobs: List[Optional[list]] = None
    output_top_logprobs: List[Optional[list]] = None
    spec_accepted_tokens: List[int] = dataclasses.field(default_factory=list)
    time_stats: List[Optional[Dict]] = None


@dataclasses.dataclass
class BatchEmbeddingOut:
    rids: List[str]
    finished_reasons: List[Optional[Dict]]
    embeddings: List[List[float]]
    prompt_tokens: List[int]


# ----------------------------------------------------------------------
# Control RPCs (abort / flush / profile / weights / health)
# ----------------------------------------------------------------------
@dataclasses.dataclass
class AbortReq:
    rid: str
    abort_all: bool = False


@dataclasses.dataclass
class FlushCacheReqInput:
    pass


@dataclasses.dataclass
class FlushCacheReqOutput:
    success: bool


@dataclasses.dataclass
class PauseGenerationReqInput:
    """Halt forward progress; requests keep queueing (reference
    `/pause_generation`, http_server.py:744)."""


@dataclasses.dataclass
class ContinueGenerationReqInput:
    pass


@dataclasses.dataclass
class PauseGenerationReqOutput:
    success: bool
    paused: bool


@dataclasses.dataclass
class ProfileReq:
    type: str  # "start" | "stop"
    output_dir: Optional[str] = None
    num_steps: Optional[int] = None


@dataclasses.dataclass
class ProfileReqOutput:
    success: bool
    message: str = ""


@dataclasses.dataclass
class GetInternalStateReq:
    pass


@dataclasses.dataclass
class GetInternalStateReqOutput:
    internal_state: Dict[str, Any]


@dataclasses.dataclass
class UpdateWeightFromDiskReqInput:
    model_path: str
    load_format: Optional[str] = None


@dataclasses.dataclass
class UpdateWeightFromDiskReqOutput:
    success: bool
    message: str


@dataclasses.dataclass
class SaveShardedStateReqInput:
    """Dump the prepared (quantized+fused) param tree as per-host shards
    (reference ShardedStateLoader save / save_remote_model)."""

    path: str


@dataclasses.dataclass
class RebalanceExpertsReqInput:
    """Force an EPLB rebalance (reference eplb_manager RPC); must run on
    the scheduler thread — it permutes live expert weights."""


@dataclasses.dataclass
class UpdateWeightsFromTensorReqInput:
    """In-memory weight sync (reference `update_weights_from_tensor`,
    RL rollout <-> trainer colocation): HF-named tensors."""

    named_tensors: list  # [(hf_name, np.ndarray)]
    num_paused_requests: int = 0


@dataclasses.dataclass
class InitWeightsUpdateGroupReqInput:
    """Join a trainer's weight-publish group (reference
    `init_weights_update_group`, NCCL there / ZMQ here)."""

    master_address: str
    master_port: int = 0
    group_name: str = "default"


@dataclasses.dataclass
class UpdateWeightsFromDistributedReqInput:
    """Pull the named tensors from the group and apply (reference
    `update_weights_from_distributed`)."""

    names: list
    group_name: str = "default"


@dataclasses.dataclass
class LoadLoRAAdapterReqInput:
    """Dynamic adapter load (reference `/load_lora_adapter`,
    `http_server.py:625-643`)."""

    lora_name: str
    lora_path: str


@dataclasses.dataclass
class UnloadLoRAAdapterReqInput:
    lora_name: str


@dataclasses.dataclass
class ReleaseMemoryOccupationReqInput:
    tags: Optional[List[str]] = None


@dataclasses.dataclass
class ResumeMemoryOccupationReqInput:
    tags: Optional[List[str]] = None


@dataclasses.dataclass
class SchedulerInfoReq:
    pass


@dataclasses.dataclass
class HealthCheckOutput:
    healthy: bool = True


class SessionAction(Enum):
    OPEN = "open"
    CLOSE = "close"


@dataclasses.dataclass
class OpenSessionReqInput:
    capacity_of_str_len: int
    session_id: Optional[str] = None


@dataclasses.dataclass
class OpenSessionReqOutput:
    session_id: Optional[str]
    success: bool


@dataclasses.dataclass
class CloseSessionReqInput:
    session_id: str


# ----------------------------------------------------------------------
# PD disaggregation (reference `disaggregation/`): prefill servers hand the
# computed KV + first token to decode servers.
# ----------------------------------------------------------------------
@dataclasses.dataclass
class KvHandoffOut:
    """Prefill-side result: first token + the KV pages for the prompt."""

    rid: str
    fill_ids: List[int]  # prompt tokens (KV computed for all of them)
    first_token: int
    kv_data: Any  # np.ndarray [L, 2, H, n, D]; None on fetch error
    error: Optional[str] = None


@dataclasses.dataclass
class InjectDecodeReqInput:
    """Decode-side: enter a request directly in decode state with
    transferred KV (reference `DecodePreallocQueue`/`DecodeTransferQueue`)."""

    rid: str
    input_ids: List[int]
    first_token: int
    kv_data: Any
    sampling_params: SamplingParams = None
    stream: bool = False
