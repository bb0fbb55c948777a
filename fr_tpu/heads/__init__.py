from fr_tpu.heads.margins import arcface, cosface, combined_margin, get_margin_fn  # noqa: F401
