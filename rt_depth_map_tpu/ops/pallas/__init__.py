"""Hand-written Pallas TPU kernels for the hot matcher paths.

XLA handles the elementwise pipeline stages well, but two structures defeat
it (tools/profile_chain.py):
  * the SGM directional recurrences lower to lax.scan whose per-iteration
    overhead dwarfs the ~3us of real work per scanline;
  * the block-matching cost volume materializes (D, H, W) int32 to HBM
    between every producer/consumer pair.
These kernels keep carries and cost stripes resident in VMEM and stream
rows with double-buffered DMA instead.
"""

from rt_depth_map_tpu.ops.pallas.bm_kernel import bm_cost_wta  # noqa: F401
from rt_depth_map_tpu.ops.pallas.lr_resolve import lr_resolve_pallas  # noqa: F401
from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas  # noqa: F401
from rt_depth_map_tpu.ops.pallas.sgm_scan import sgm_aggregate_vertical  # noqa: F401
