from .sample import (sample_model, top_k_top_p_filtering,
                     make_sampling_fn, make_sharded_sampling_fn,
                     sample_hierarchical, precompute_decode_state)

__all__ = [
    "sample_model",
    "top_k_top_p_filtering",
    "make_sampling_fn",
    "make_sharded_sampling_fn",
    "sample_hierarchical",
    "precompute_decode_state",
]
