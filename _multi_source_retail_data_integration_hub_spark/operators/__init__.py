from .scd2 import END_OF_TIME, scd2_initial, scd2_merge

__all__ = ["END_OF_TIME", "scd2_initial", "scd2_merge"]
