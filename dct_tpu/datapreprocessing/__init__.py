from .slicers import norm_arr, save_volume_slices  # noqa: F401
