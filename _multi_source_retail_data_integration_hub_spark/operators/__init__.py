from .asof import asof_join
from .graph import connected_components
from .ranges import interval_join
from .sampling import deterministic_sample, stratified_sample
from .scd2 import END_OF_TIME, scd2_initial, scd2_merge
from .skew import replicated_join, salted_agg

__all__ = [
    "END_OF_TIME",
    "asof_join",
    "connected_components",
    "deterministic_sample",
    "interval_join",
    "replicated_join",
    "salted_agg",
    "scd2_initial",
    "scd2_merge",
    "stratified_sample",
]
