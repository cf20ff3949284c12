from uniir_tpu.models.clip import CLIP_CONFIGS, CLIPConfig, CLIPTextTower, CLIPVisionTower
from uniir_tpu.models.clip_sf import CLIPScoreFusion
from uniir_tpu.models.clip_ff import CLIPFeatureFusion
from uniir_tpu.models.blip_sf import BLIPScoreFusion
from uniir_tpu.models.blip_ff import BLIPFeatureFusion
from uniir_tpu.models.blip_vit import BLIP_VIT_CONFIGS, BLIPVisionTransformer
from uniir_tpu.models.med import MED_CONFIGS, MedBertModel
from uniir_tpu.models.t5_fusion import T5FusionConfig, T5FusionStack
from uniir_tpu.models.registry import ModelBundle, build_model_from_config
