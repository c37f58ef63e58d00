from cuopt_tpu.io.mps_parser import ParseMps, parse_mps

__all__ = ["parse_mps", "ParseMps"]
