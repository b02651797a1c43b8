"""Prometheus metrics export.

Counterpart of the reference's `srt/metrics/collector.py`
(`SchedulerMetricsCollector:151`, `TokenizerMetricsCollector:309`) with the
same metric names (`sglang:*`) so existing dashboards
(`examples/monitoring/`, `docs/references/production_metrics.md:11-40`)
keep working.
"""

from __future__ import annotations

import time
from typing import Optional

try:
    from prometheus_client import (
        CollectorRegistry,
        Counter,
        Gauge,
        Histogram,
        generate_latest,
    )

    PROM_AVAILABLE = True
except ImportError:  # pragma: no cover
    PROM_AVAILABLE = False

_REGISTRY: Optional["CollectorRegistry"] = None
_METRICS = {}


def _get_registry():
    global _REGISTRY, _METRICS
    if _REGISTRY is None:
        _REGISTRY = CollectorRegistry()
        _METRICS = {
            "num_running_reqs": Gauge(
                "sglang:num_running_reqs",
                "Number of running requests",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "num_waiting_reqs": Gauge(
                "sglang:num_queue_reqs",
                "Number of queued requests",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "token_usage": Gauge(
                "sglang:token_usage",
                "KV token slot utilization",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "cache_hit_rate": Gauge(
                "sglang:cache_hit_rate",
                "Radix prefix cache hit rate",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "gen_throughput": Gauge(
                "sglang:gen_throughput",
                "Generation throughput (tok/s)",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "forward_ct": Gauge(
                "sglang:num_forward_passes",
                "Total forward passes",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "num_retracted_reqs": Gauge(
                "sglang:num_retracted_reqs",
                "Requests retracted on KV OOM",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "spec_accept_length": Gauge(
                "sglang:spec_accept_length",
                "Mean tokens committed per speculative round",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "jump_forward_tokens": Gauge(
                "sglang:num_jump_forward_tokens",
                "Grammar tokens emitted by jump-forward",
                ["model_name"],
                registry=_REGISTRY,
            ),
            # request-latency histograms (reference
            # TokenizerMetricsCollector:309 names)
            "prompt_tokens_total": Counter(
                "sglang:prompt_tokens_total",
                "Prompt tokens processed",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "generation_tokens_total": Counter(
                "sglang:generation_tokens_total",
                "Tokens generated",
                ["model_name"],
                registry=_REGISTRY,
            ),
            "ttft": Histogram(
                "sglang:time_to_first_token_seconds",
                "Time to first token",
                ["model_name"],
                buckets=(0.1, 0.25, 0.5, 1, 2, 5, 10, 20, 60),
                registry=_REGISTRY,
            ),
            "e2e": Histogram(
                "sglang:e2e_request_latency_seconds",
                "End-to-end request latency",
                ["model_name"],
                buckets=(0.25, 0.5, 1, 2, 5, 10, 30, 60, 120, 300),
                registry=_REGISTRY,
            ),
            "itl": Histogram(
                "sglang:inter_token_latency_seconds",
                "Mean inter-token latency per request",
                ["model_name"],
                buckets=(0.005, 0.01, 0.02, 0.05, 0.1, 0.25, 0.5, 1, 2),
                registry=_REGISTRY,
            ),
        }
    return _REGISTRY


def observe_request(model, prompt_tokens, output_tokens, ttft, e2e, itl):
    """Record one finished request's stage latencies (called by the
    scheduler at finish time; histograms are event-driven, unlike the
    pull-time gauges in render_prometheus)."""
    if not PROM_AVAILABLE:
        return
    _get_registry()
    _METRICS["prompt_tokens_total"].labels(model).inc(prompt_tokens)
    _METRICS["generation_tokens_total"].labels(model).inc(output_tokens)
    if ttft is not None:
        _METRICS["ttft"].labels(model).observe(ttft)
    _METRICS["e2e"].labels(model).observe(e2e)
    if itl is not None:
        _METRICS["itl"].labels(model).observe(itl)


def render_prometheus(engine) -> str:
    if not PROM_AVAILABLE:
        return "# prometheus_client not available\n"
    reg = _get_registry()
    model = engine.server_args.served_model_name or "default"
    state = engine.get_internal_state()
    sched = engine.scheduler
    _METRICS["num_running_reqs"].labels(model).set(state["num_running_reqs"])
    _METRICS["num_waiting_reqs"].labels(model).set(state["num_waiting_reqs"])
    _METRICS["token_usage"].labels(model).set(state["token_usage"])
    _METRICS["cache_hit_rate"].labels(model).set(state["cache_hit_rate"])
    _METRICS["gen_throughput"].labels(model).set(sched.stats.gen_throughput)
    _METRICS["forward_ct"].labels(model).set(state["forward_ct"])
    _METRICS["num_retracted_reqs"].labels(model).set(sched.stats.num_retracted_reqs)
    rounds = getattr(sched, "total_spec_rounds", 0)
    if rounds:
        _METRICS["spec_accept_length"].labels(model).set(
            1.0 + getattr(sched, "total_spec_accepted", 0) / rounds
        )
    _METRICS["jump_forward_tokens"].labels(model).set(
        getattr(sched, "num_jump_forward_tokens", 0)
    )
    return generate_latest(reg).decode()
