from gtos_tpu.infer.beam import beam_search, BeamResult, greedy_search

__all__ = ["beam_search", "greedy_search", "BeamResult"]
