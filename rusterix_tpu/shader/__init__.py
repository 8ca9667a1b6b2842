from .jaxc import CompileError, Evaluator, Program, Rusteria, Val
from .patterns import PATTERN_NAMES, pattern_bank

__all__ = [
    "CompileError",
    "Evaluator",
    "Program",
    "Rusteria",
    "Val",
    "PATTERN_NAMES",
    "pattern_bank",
]
