"""Higher-order-function expression helpers.

Spark HOF lambda BODIES re-evaluate any captured expression tree once per
array element (lambdas capture expressions, not values, and HOFs never
enter codegen/CSE). ``bind_once`` is the engine-wide idiom for paying a
computed array/scalar exactly once per row before per-element work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(value: Column, fn) -> Column:
    """Evaluate ``value`` once per row and pass it to ``fn`` as a bound
    lambda variable.

    Wrapping the expression as the single element of an array and
    transforming over it binds it to a NamedLambdaVariable, which IS
    evaluated once; inner lambdas then reference the variable, not the
    tree (measured ~4x on the sf1 shingle stage, ~1.5x on language_id).

    CAVEAT: the bound expression must NOT be fed to a Python UDF as an
    argument — with cross-level lambda variable references in the arg,
    ExtractPythonUDFs leaves the UDF un-extracted in any non-pristine
    session (runtime INTERNAL_ERROR "Cannot evaluate expression").
    UDF consumers must materialize the bound expression behind an
    ``explode(array(.))`` Generate barrier first so the UDF sees a plain
    attribute (see ``operators/dedup._banded_index``), or use an unbound
    shape.
    """
    return F.transform(F.array(value), fn)[0]
