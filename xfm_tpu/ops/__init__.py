from .attention import dot_product_attention, mask_to_bias, NEG_INF
from .patch_embed import extract_patches, patchify_kernel_from_conv
