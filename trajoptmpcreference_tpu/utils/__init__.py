"""Observability utilities: solver traces, XLA op accounting, timing."""

from trajoptmpcreference_tpu.utils.flops import cost_analysis
from trajoptmpcreference_tpu.utils.timing import time_fn
from trajoptmpcreference_tpu.utils.trace import SQPTrace, solve_traced

__all__ = ["cost_analysis", "time_fn", "SQPTrace", "solve_traced"]
