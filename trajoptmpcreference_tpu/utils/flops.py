"""Op accounting from the XLA compiler.

The reference counts operations by intercepting every ndarray op with a
subclass and recording 30-frame call stacks (ref: overloading.py:146-164,
analyzed in analysis/operation_analysis.ipynb for accelerator sizing).  On
TPU the compiler already knows: ``lower().compile().cost_analysis()``
reports flops / transcendentals / bytes accessed for the fused program —
the same sizing data with zero runtime overhead.
"""

from __future__ import annotations

from typing import Any, Dict

import jax


def cost_analysis(fn, *args, **kwargs) -> Dict[str, Any]:
    """Compile ``fn(*args)`` and return XLA's cost analysis plus memory
    stats.  Keys: flops, transcendentals, bytes accessed, utilization...,
    plus generated_code_size_in_bytes / argument_size_in_bytes etc."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    out: Dict[str, Any] = {}
    ca = compiled.cost_analysis()
    if ca:
        # cost_analysis returns a dict (newer jax) or [dict]
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out.update(ca)
    try:
        mem = compiled.memory_analysis()
        for key in ("generated_code_size_in_bytes",
                    "argument_size_in_bytes",
                    "output_size_in_bytes",
                    "temp_size_in_bytes"):
            v = getattr(mem, key, None)
            if v is not None:
                out[key] = v
    except Exception:
        pass
    return out
