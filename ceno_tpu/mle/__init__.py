from .mle import (
    eq_eval,
    eq_table,
    evaluate,
    fix_low_var,
    fix_variables,
    num_vars,
)

__all__ = [
    "fix_low_var",
    "fix_variables",
    "evaluate",
    "eq_table",
    "eq_eval",
    "num_vars",
]
