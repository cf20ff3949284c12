"""uniir_tpu: a TPU-native multimodal retrieval framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of UniIR
(TIGER-AI-Lab/UniIR): four instruction-following multimodal retriever variants
(CLIP-ScoreFusion, CLIP-FeatureFusion, BLIP-ScoreFusion, BLIP-FeatureFusion),
in-batch contrastive training on M-BEIR with globally-gathered negatives, and
the embed -> index -> retrieve -> Recall@k evaluation pipeline over the
5.6M-candidate union pool.

Design notes (TPU-first, not a port):
  * All compute paths are jittable pure functions over pytrees; the batch is a
    globally-sharded array over a `jax.sharding.Mesh` data axis, so the
    reference's DDP + torch.distributed.nn.all_gather loss (reference
    src/models/uniir_clip/clip_scorefusion/clip_sf.py:101-136) becomes a plain
    matmul over the global batch -- XLA inserts the collectives.
  * Retrieval replaces FAISS (reference src/common/mbeir_retriever.py) with an
    HBM-resident sharded exact top-k (tiled matmul + streaming k-selection).
  * bf16 on the MXU replaces CUDA AMP; `jax.checkpoint` replaces fairscale
    checkpoint_wrapper.
"""

__version__ = "0.1.0"
