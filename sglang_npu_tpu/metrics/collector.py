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
        }
    return _REGISTRY


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
    return generate_latest(reg).decode()
