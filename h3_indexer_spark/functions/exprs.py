"""Expression-level helpers shared by the JVM-side operator library."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(binding: Column, body: Callable[[Column], Column]) -> Column:
    """Let-binding for Spark expressions: evaluate ``binding`` once per
    row and pass it to ``body`` as a bound lambda variable.

    Why this exists: reusing a Python variable holding a Column splices
    the same expression subtree into the plan once per use, and
    Catalyst's CollapseProject likewise inlines single-use projection
    aliases into their consumers — including into higher-order-function
    lambda bodies, where the inlined subtree is then re-evaluated PER
    ARRAY ELEMENT. An O(n) pipeline silently becomes O(n^2) or worse
    (observed: a minhash signature plan that re-evaluated the whole
    shingle computation 64x per row). Wrapping the intermediate as the
    *input* of a HOF pins it: HOF inputs are evaluated exactly once per
    row, and lambda variables cannot be inlined into.

    Cost: one single-element array allocation per row — noise next to
    the recompute it prevents.
    """
    return F.transform(F.array(binding), lambda v: body(v))[0]
