from .expr import Expr, Op, col, lit

__all__ = ["Expr", "Op", "col", "lit"]
