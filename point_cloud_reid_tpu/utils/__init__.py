"""Utilities: structured logging, profiling, seeding.

Replaces the reference's logging/observability layer (SURVEY.md §5.5): the hard
Neptune dependency becomes pluggable writers (stdout + JSONL + optional
TensorBoard); ad-hoc verbose timers become a jax.profiler hook.
"""
from .logging import MetricLogger
from .profiling import StepTimer, trace_context

__all__ = ["MetricLogger", "StepTimer", "trace_context"]
