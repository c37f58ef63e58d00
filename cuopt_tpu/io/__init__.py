from cuopt_tpu.io.mps_parser import ParseMps, parse_mps
from cuopt_tpu.io.native_mps import available as native_parser_available

__all__ = ["parse_mps", "ParseMps", "native_parser_available"]
