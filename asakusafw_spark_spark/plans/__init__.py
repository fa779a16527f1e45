"""Flow assembly + execution (SURVEY.md §3's idiomatic replacement)."""

from .audit import assert_scale_safe, plan_summary
from .flow import FlowGraph
from .iterative import IterativeRunner

__all__ = ["FlowGraph", "IterativeRunner", "plan_summary", "assert_scale_safe"]
