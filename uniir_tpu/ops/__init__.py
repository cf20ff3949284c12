from uniir_tpu.ops.topk import bucketed_topk, chunked_topk, pad_pool_for_chunks, sharded_topk
from uniir_tpu.ops.topk_pallas import bucket_max_scores, pallas_topk
from uniir_tpu.ops.image_ops import pallas_fused_preprocess, preprocess_images, resize_matrix
from uniir_tpu.ops.quant import QuantDense, int8_matmul, quantize_tree
