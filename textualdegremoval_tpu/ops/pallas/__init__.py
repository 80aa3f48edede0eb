from textualdegremoval_tpu.ops.pallas.mdta import (
    mdta_attention_pallas,
    mdta_stats_pallas,
)
from textualdegremoval_tpu.ops.pallas.tblock import (
    tblock_fused,
    tblock_ref,
)

__all__ = ["mdta_attention_pallas", "mdta_stats_pallas", "tblock_fused",
           "tblock_ref"]
