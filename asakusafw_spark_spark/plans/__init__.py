"""Flow assembly + execution (SURVEY.md §3's idiomatic replacement)."""

from .flow import FlowGraph
from .iterative import IterativeRunner

__all__ = ["FlowGraph", "IterativeRunner"]
