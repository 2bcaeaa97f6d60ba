"""Hand-written TPU kernels (Pallas) for the hot ops."""

from gaudi_tpu.ops.fused_edge import edge_block_attn_sum, edge_block_coord

__all__ = ["edge_block_attn_sum", "edge_block_coord"]
