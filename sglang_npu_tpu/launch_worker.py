"""Worker-node entry point for multi-host serving.

Counterpart of the reference's scheduler subprocesses on node_rank > 0
(`srt/entrypoints/engine.py:715-741` run_scheduler_process): runs a
ModelRunner + Scheduler whose input/output queues are ZMQ links back to
the entry node (see `managers/zmq_transport.py` for the port scheme).

    python -m sglang_npu_tpu.launch_worker \
        --model-path ... --dist-init-addr ENTRY_HOST:PORT --node-rank 1
"""

from __future__ import annotations

import logging
import os
import time

if os.environ.get("SGLANG_TPU_FORCE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from sglang_npu_tpu.server_args import ServerArgs, prepare_server_args

logger = logging.getLogger(__name__)


def run_worker(server_args: ServerArgs):
    assert server_args.dist_init_addr, "--dist-init-addr required"
    assert server_args.node_rank >= 1, "workers have node_rank >= 1"

    from sglang_npu_tpu.configs.model_config import ModelConfig
    from sglang_npu_tpu.managers.scheduler import (
        Scheduler,
        run_scheduler_thread,
    )
    from sglang_npu_tpu.managers.zmq_transport import worker_node_queues
    from sglang_npu_tpu.model_executor.model_runner import ModelRunner
    from sglang_npu_tpu.tokenizer.byte_tokenizer import get_tokenizer

    model_config = ModelConfig.from_model_path(
        server_args.model_path,
        dtype=server_args.dtype,
        context_length=server_args.context_length,
        json_override=server_args.json_model_override_args,
    )
    tokenizer = (
        None
        if server_args.skip_tokenizer_init
        else get_tokenizer(
            server_args.tokenizer_path, server_args.tokenizer_mode
        )
    )
    inputs, results = worker_node_queues(
        server_args.dist_init_addr, server_args.node_rank - 1
    )
    runner = ModelRunner(server_args, model_config)
    scheduler = Scheduler(
        server_args,
        runner,
        input_queue=inputs,
        output_queue=results,
        tokenizer=tokenizer,
    )
    t = run_scheduler_thread(scheduler)
    logger.info(
        "worker %d ready (entry=%s)",
        server_args.node_rank,
        server_args.dist_init_addr,
    )
    try:
        while t.is_alive():
            time.sleep(1.0)
    except KeyboardInterrupt:
        scheduler.shutdown()


def run_worker_spmd(server_args: ServerArgs):
    """Cross-host SPMD worker: joins the jax.distributed runtime, then runs
    a lockstep Scheduler replica fed by node 0's SpmdStepChannel broadcast
    (see parallel/dist.py for the process model; reference analogue:
    scheduler processes on node_rank > 0, `engine.py:715-741`)."""
    assert server_args.dist_init_addr and server_args.node_rank >= 1
    import queue as _q

    from sglang_npu_tpu.parallel.dist import init_multihost_spmd

    init_multihost_spmd(server_args)  # before any device use

    from sglang_npu_tpu.configs.model_config import ModelConfig
    from sglang_npu_tpu.managers.scheduler import (
        Scheduler,
        run_scheduler_thread,
    )
    from sglang_npu_tpu.managers.zmq_transport import (
        NullQueue,
        SpmdStepChannel,
    )
    from sglang_npu_tpu.model_executor.model_runner import ModelRunner
    from sglang_npu_tpu.tokenizer.byte_tokenizer import get_tokenizer

    channel = SpmdStepChannel(server_args.dist_init_addr, is_entry=False)
    model_config = ModelConfig.from_model_path(
        server_args.model_path,
        dtype=server_args.dtype,
        context_length=server_args.context_length,
        json_override=server_args.json_model_override_args,
    )
    tokenizer = (
        None
        if server_args.skip_tokenizer_init
        else get_tokenizer(server_args.tokenizer_path, server_args.tokenizer_mode)
    )
    runner = ModelRunner(server_args, model_config)
    scheduler = Scheduler(
        server_args,
        runner,
        input_queue=_q.Queue(),  # unused: inputs arrive via the broadcast
        output_queue=NullQueue(),  # node 0 emits; replicas compute only
        tokenizer=tokenizer,
        spmd_channel=channel,
    )
    t = run_scheduler_thread(scheduler)
    logger.info("SPMD worker %d ready", server_args.node_rank)
    try:
        while t.is_alive():
            time.sleep(1.0)
    except KeyboardInterrupt:
        scheduler.shutdown()


def main():
    import sys

    logging.basicConfig(level=logging.INFO)
    args = prepare_server_args(sys.argv[1:])
    if args.multihost_spmd:
        run_worker_spmd(args)
    else:
        run_worker(args)


if __name__ == "__main__":
    main()
