"""H3 cell-index bit-layout constants.

Layout (see reference /root/reference/src/cell.rs:23-130 and the public H3
index spec https://h3geo.org/docs/core-library/h3Indexing/):

    bit 63        : reserved, must be 0
    bits 59..62   : mode (1 == cell)
    bits 56..58   : mode-dependent (0 for cells)
    bits 52..55   : resolution, 0..15
    bits 45..51   : base cell, [0, 122)
    bits 0..44    : 15 x 3-bit digits for res 1..15; digits finer than the
                    cell's own resolution are set to 0b111

All valid cell indices have bit 63 == 0, so they round-trip exactly through
a signed 64-bit ``BIGINT`` (non-negative).  Every operator in this package
treats cells as plain ``LongType`` columns.
"""

MODE_CELL = 1

RES_OFFSET = 52
RES_MASK = 0xF << RES_OFFSET

BASE_OFFSET = 45
BASE_MASK = 0x7F << BASE_OFFSET

MODE_OFFSET = 59
MODE_MASK = 0xF << MODE_OFFSET

MODE_DEP_OFFSET = 56

MAX_RES = 15
NUM_BASE_CELLS = 122
DIGIT_BITS = 3
NUM_DIGITS = 15  # res 1..15

# All 45 digit bits set (what trailing digits look like for a res-0 cell).
ALL_DIGIT_BITS = (1 << (NUM_DIGITS * DIGIT_BITS)) - 1

# Template: mode=1, res=0, base=0, all digits 0b111.
# == 0x8001fffffffffff with base 0 (reference CellStack seed,
# /root/reference/src/cell.rs:261).
CELL_TEMPLATE = (MODE_CELL << MODE_OFFSET) | ALL_DIGIT_BITS


def trailing_bits(res: int) -> int:
    """Number of low-order digit bits *below* resolution ``res``."""
    return (MAX_RES - res) * DIGIT_BITS


def trailing_mask(res: int) -> int:
    """Mask of the digit bits below resolution ``res``."""
    return (1 << trailing_bits(res)) - 1
