"""Per-column lightweight compression codecs (pure numpy/pyarrow, no Ray).

Importing this package registers all codecs: plain (the Supersonic
physical layout), for_bitpack (FOR/delta + bit-packing), dict, rle,
fsst — each composable with a zlib/bz2/lzma backend wrap — plus the
stats-driven auto-selector.
"""

from .base import (  # noqa: F401
    BACKEND_BZ2,
    BACKEND_IDS,
    BACKEND_LZMA,
    BACKEND_NAMES,
    BACKEND_NONE,
    BACKEND_ZLIB,
    Codec,
    blob_info,
    by_name,
    codec_names,
    decode_array,
    encode_array,
)
from .plain import PLAIN  # noqa: F401
from .for_bitpack import FOR_BITPACK  # noqa: F401
from .dictionary import DICT  # noqa: F401
from .rle import RLE  # noqa: F401
from .fsst import FSST, FsstCodec  # noqa: F401
from .alp import ALP  # noqa: F401
from .frontcode import FRONTCODE  # noqa: F401
from .worddict import WORDDICT  # noqa: F401
from .numsplit import NUMSPLIT  # noqa: F401
from .xref import XREF, XrefCodec  # noqa: F401
from .selector import ColumnStats, choose_codec, column_stats  # noqa: F401
