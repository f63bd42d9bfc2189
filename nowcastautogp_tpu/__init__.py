"""nowcastautogp_tpu — TPU-native nowcast + AutoGP-style GP forecasting framework."""

from .tdata import TData, create_transformed_data
from .transforms import get_transformations

__all__ = ["TData", "create_transformed_data", "get_transformations"]
