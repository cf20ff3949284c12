"""Full-tower numerical parity: tiny CLIP towers vs a from-scratch torch
implementation (catches pos-embed/pooling/projection wiring that block-level
tests cannot)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tests.test_convert import fake_clip_sd, torch_clip_resblock
from uniir_tpu.models import convert
from uniir_tpu.models.clip import CLIP_CONFIGS, CLIPTextTower, CLIPVisionTower

CFG = CLIP_CONFIGS["test-tiny"]


def torch_vision_tower(img_nchw, sd, cfg):
    x = F.conv2d(img_nchw, sd["visual.conv1.weight"], stride=cfg.patch_size)  # [B, W, g, g]
    B, W, g, _ = x.shape
    x = x.reshape(B, W, g * g).permute(0, 2, 1)  # [B, L, W]
    cls = sd["visual.class_embedding"].reshape(1, 1, W).expand(B, 1, W)
    x = torch.cat([cls, x], dim=1)
    x = x + sd["visual.positional_embedding"]
    x = F.layer_norm(x, (W,), sd["visual.ln_pre.weight"], sd["visual.ln_pre.bias"])
    for i in range(cfg.vision_layers):
        x = torch_clip_resblock(x, sd, f"visual.transformer.resblocks.{i}", cfg.vision_heads)
    x = F.layer_norm(x[:, 0], (W,), sd["visual.ln_post.weight"], sd["visual.ln_post.bias"])
    return x @ sd["visual.proj"]


def torch_text_tower(tokens, sd, cfg):
    x = sd["token_embedding.weight"][tokens]
    x = x + sd["positional_embedding"][: x.shape[1]]
    L = x.shape[1]
    # causal mask
    for i in range(cfg.text_layers):
        # torch_clip_resblock has no mask support; emulate causal by direct code
        p = f"transformer.resblocks.{i}"
        W = cfg.text_width
        h = F.layer_norm(x, (W,), sd[f"{p}.ln_1.weight"], sd[f"{p}.ln_1.bias"])
        qkv = h @ sd[f"{p}.attn.in_proj_weight"].T + sd[f"{p}.attn.in_proj_bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        B = x.shape[0]
        hd = W // cfg.text_heads
        def split(t):
            return t.reshape(B, L, cfg.text_heads, hd).permute(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        scores = q @ k.transpose(-1, -2) / hd**0.5
        causal = torch.full((L, L), float("-inf")).triu(1)
        scores = scores + causal
        attn = torch.softmax(scores, dim=-1)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(B, L, W)
        o = o @ sd[f"{p}.attn.out_proj.weight"].T + sd[f"{p}.attn.out_proj.bias"]
        x = x + o
        h = F.layer_norm(x, (W,), sd[f"{p}.ln_2.weight"], sd[f"{p}.ln_2.bias"])
        h = h @ sd[f"{p}.mlp.c_fc.weight"].T + sd[f"{p}.mlp.c_fc.bias"]
        h = h * torch.sigmoid(1.702 * h)
        h = h @ sd[f"{p}.mlp.c_proj.weight"].T + sd[f"{p}.mlp.c_proj.bias"]
        x = x + h
    x = F.layer_norm(x, (cfg.text_width,), sd["ln_final.weight"], sd["ln_final.bias"])
    eot = tokens.argmax(dim=-1)
    pooled = x[torch.arange(x.shape[0]), eot]
    return pooled @ sd["text_projection"]


def test_vision_tower_full_parity():
    torch.manual_seed(0)
    sd = {k: v * 0.05 if v.ndim >= 2 else v for k, v in fake_clip_sd(CFG).items()}
    np_sd = convert.to_numpy_state_dict(sd)
    params = convert.convert_clip_vision_tower(np_sd, CFG.vision_layers)

    img = torch.randn(2, 3, CFG.image_size, CFG.image_size) * 0.5
    ref = torch_vision_tower(img, sd, CFG).detach().numpy()

    tower = CLIPVisionTower(CFG, pool="cls")
    img_nhwc = np.transpose(img.numpy(), (0, 2, 3, 1))
    out = tower.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, img_nhwc)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_text_tower_full_parity():
    torch.manual_seed(1)
    sd = {k: v * 0.05 if v.ndim >= 2 else v for k, v in fake_clip_sd(CFG).items()}
    np_sd = convert.to_numpy_state_dict(sd)
    params = convert.convert_clip_text_tower(np_sd, CFG.text_layers, with_projection=True)

    tokens = torch.randint(1, CFG.vocab_size - 1, (3, CFG.context_length))
    tokens[:, -1] = CFG.vocab_size - 1  # EOT = argmax position
    ref = torch_text_tower(tokens, sd, CFG).detach().numpy()

    tower = CLIPTextTower(CFG, pool="eot")
    out = tower.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, tokens.numpy().astype(np.int32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_med_full_model_parity():
    """MedBertModel end-to-end (embeddings + layers + pooler) vs torch."""
    from tests.test_convert import fake_blip_sd
    from uniir_tpu.models.blip_vit import BLIP_VIT_CONFIGS
    from uniir_tpu.models.med import MED_CONFIGS, MedBertModel
    from tests.test_convert import torch_bert_layer

    med = MED_CONFIGS["test-tiny"]
    vit = BLIP_VIT_CONFIGS["test-tiny"]
    torch.manual_seed(3)
    sd = {k: v * 0.1 if v.ndim >= 2 else v for k, v in fake_blip_sd(vit, med, with_pooler=True).items()}
    np_sd = convert.to_numpy_state_dict(sd)
    params = convert.convert_med_bert(np_sd, "text_encoder", med.num_hidden_layers, with_pooler=True)

    B, L, Lk = 2, 7, 5
    ids = torch.randint(1, med.vocab_size - 1, (B, L))
    attn = torch.ones(B, L, dtype=torch.long)
    attn[:, -2:] = 0
    enc = torch.randn(B, Lk, med.encoder_width) * 0.5

    # torch reference: embeddings -> layers (with cross-attn) -> pooler
    H = med.hidden_size
    x = sd["text_encoder.embeddings.word_embeddings.weight"][ids]
    x = x + sd["text_encoder.embeddings.position_embeddings.weight"][:L]
    x = F.layer_norm(x, (H,), sd["text_encoder.embeddings.LayerNorm.weight"], sd["text_encoder.embeddings.LayerNorm.bias"], eps=1e-12)
    mask = (1.0 - attn[:, None, None, :].float()) * -1e9
    for i in range(med.num_hidden_layers):
        x = torch_bert_layer(x, mask, sd, f"text_encoder.encoder.layer.{i}", med.num_attention_heads, enc=enc)
    pooled_ref = torch.tanh(x[:, 0] @ sd["text_encoder.pooler.dense.weight"].T + sd["text_encoder.pooler.dense.bias"])

    model = MedBertModel(med, add_pooling_layer=True)
    hidden, pooled = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        ids.numpy().astype(np.int32),
        attn.numpy().astype(np.int32),
        jnp.asarray(enc.numpy()),
        None,
        "multimodal",
    )
    np.testing.assert_allclose(np.asarray(hidden), x.detach().numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(pooled), pooled_ref.detach().numpy(), atol=3e-4)
