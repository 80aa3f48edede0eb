from textualdegremoval_tpu.ops.pallas.mdta import (
    mdta_attention_pallas,
    mdta_stats_pallas,
)

__all__ = ["mdta_attention_pallas", "mdta_stats_pallas"]
