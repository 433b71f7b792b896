"""Torch/Lightning checkpoint <-> flax parameter interop for the flagship.

The reference warm-starts from Lightning ``.ckpt`` files by stripping the
``model.`` prefix, dropping ``quantizer.*`` keys, and shape-filtering
(/root/reference/experiment.py:202-233,277-304). This module reproduces
those semantics for *foreign torch checkpoints*, so anything trained by
the reference can warm-start this framework (and vice versa):

  - ``torch_state_dict_to_flax(sd, template)``: reference-named torch
    state_dict -> merged flax param tree (prefix strip, quantizer drop,
    shape filter — skipped keys keep their fresh init, matching
    ``load_state_dict(strict=False)``).
  - ``flax_params_to_torch_state_dict(params)``: the exact inverse, for
    exporting trained flax weights to the reference's naming.

Layout rules (validated by tests/test_torch_parity.py's copied-weight
oracles): torch ``nn.Linear`` stores W [out, in] with y = x W^T, flax
Dense stores kernel [in, out] — every weight transposes. Attention
in_proj is the row-concatenation [Wq; Wk; Wv]; flax keeps per-projection
DenseGeneral kernels [E, H, hd] (and out_proj [H, hd, E]). LayerNorm
weight -> scale.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

# torch LayerNorm module names -> flax (same name; weight->scale)
_LN_DIRECT = {"enc_ln", "ln_geo", "ln_ss", "mem_ln"}
# torch Linear names mapping 1:1 to flax Dense modules
_LINEAR_DIRECT = {"input_proj", "ss_input_proj", "to_code", "from_code",
                  "head_xyz", "head_ss"}
# transformer sub-layer renames inside encoder/decoder blocks
_BLOCK_LN = {"norm1": "ln1", "norm2": "ln2", "norm3": "ln3"}
_BLOCK_FFN = {"linear1": "ffn/fc1", "linear2": "ffn/fc2"}


def strip_model_prefix(sd: Dict[str, Any],
                       prefix: str = "model.") -> Dict[str, Any]:
    """Lightning saves the module under `model.` (experiment.py:204-211)."""
    return {(k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in sd.items()}


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _split_in_proj(w: np.ndarray, b) -> Dict[str, Tuple[np.ndarray, Any]]:
    """torch in_proj_weight [3E, E] (+bias [3E]) -> per-projection
    (kernel2d [E, E] already transposed to flax order, bias1d [E])."""
    e = w.shape[1]
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        wi = w[i * e:(i + 1) * e]          # [E, E] torch order
        bi = b[i * e:(i + 1) * e] if b is not None else None
        out[name] = (wi.T, bi)
    return out


def torch_key_to_flax_entries(key: str, value: np.ndarray,
                              sd: Dict[str, np.ndarray]
                              ) -> List[Tuple[str, np.ndarray]]:
    """One reference state_dict key -> [(flax_path, array)] candidates.

    Arrays are in flax orientation but possibly flattened (attention
    kernels); the merge step reshapes to the template leaf. Returns []
    for keys handled elsewhere (biases folded into their weight entry,
    buffers, quantizer state).
    """
    v = value

    # non-param buffers / quantizer state (dropped on warm-start — the
    # codebook lives in VQState here, reproducing the drop structurally)
    if key.startswith("quantizer.") or key == "pos_enc":
        return []

    parts = key.split(".")
    mod, leaf = ".".join(parts[:-1]), parts[-1]

    # direct parameters
    if key == "query_embed.weight":
        return [("query_embed", v)]
    if key == "tokenizer.queries":
        return [("tokenizer/queries", v)]

    if mod in _LINEAR_DIRECT:
        if leaf == "weight":
            return [(f"{mod}/kernel", v.T)]
        return [(f"{mod}/bias", v)]
    if mod in _LN_DIRECT:
        return [(f"{mod}/{'scale' if leaf == 'weight' else 'bias'}", v)]

    # fuse MLP: Sequential(Linear, GELU, Linear, LayerNorm)
    m = re.fullmatch(r"fuse_mlp\.(\d)", mod)
    if m:
        slot = int(m.group(1))
        if slot in (0, 2):
            name = "fuse_fc1" if slot == 0 else "fuse_fc2"
            return [(f"{name}/kernel", v.T) if leaf == "weight"
                    else (f"{name}/bias", v)]
        if slot == 3:
            return [(f"fuse_ln/{'scale' if leaf == 'weight' else 'bias'}",
                     v)]
        return []

    # attention projections (any *.{self_attn,multihead_attn,attn}.*)
    m = re.fullmatch(r"(.*)\.(self_attn|multihead_attn|attn)", mod)
    if m is None:
        m2 = re.fullmatch(r"(.*)\.(self_attn|multihead_attn|attn)"
                          r"\.out_proj", mod)
        if m2:
            owner, att = m2.group(1), m2.group(2)
            base = _attn_flax_base(owner, att)
            if base is None:
                return []
            if leaf == "weight":
                return [(f"{base}/out_proj/kernel", v.T)]
            return [(f"{base}/out_proj/bias", v)]
    else:
        owner, att = m.group(1), m.group(2)
        base = _attn_flax_base(owner, att)
        if base is None:
            return []
        if leaf == "in_proj_weight":
            bias = sd.get(f"{mod}.in_proj_bias")
            entries = []
            for name, (wk, bk) in _split_in_proj(
                    v, _to_np(bias) if bias is not None else None).items():
                entries.append((f"{base}/{name}/kernel", wk))
                if bk is not None:
                    entries.append((f"{base}/{name}/bias", bk))
            return entries
        if leaf == "in_proj_bias":
            return []  # folded into in_proj_weight handling

    # encoder/decoder/ss_encoder transformer layers
    m = re.fullmatch(
        r"(encoder|ss_encoder|decoder)\.layers\.(\d+)\.(.+)", mod)
    if m:
        stack, i, rest = m.group(1), int(m.group(2)), m.group(3)
        base = f"{stack}/layer_{i}"
        if rest in _BLOCK_LN:
            return [(f"{base}/{_BLOCK_LN[rest]}/"
                     f"{'scale' if leaf == 'weight' else 'bias'}", v)]
        if rest in _BLOCK_FFN:
            return [(f"{base}/{_BLOCK_FFN[rest]}/kernel", v.T)
                    if leaf == "weight"
                    else (f"{base}/{_BLOCK_FFN[rest]}/bias", v)]
        return []

    # tokenizer blocks
    m = re.fullmatch(r"tokenizer\.layers\.(\d+)\.(.+)", mod)
    if m:
        i, rest = int(m.group(1)), m.group(2)
        base = f"tokenizer/block_{i}"
        if rest in ("ln_q", "ln_kv", "ln_o"):
            return [(f"{base}/{rest}/"
                     f"{'scale' if leaf == 'weight' else 'bias'}", v)]
        fm = re.fullmatch(r"ffn\.(\d)", rest)
        if fm:
            slot = int(fm.group(1))
            if slot in (0, 2):
                name = "fc1" if slot == 0 else "fc2"
                return [(f"{base}/ffn/{name}/kernel", v.T)
                        if leaf == "weight"
                        else (f"{base}/ffn/{name}/bias", v)]
        return []

    return []


def _attn_flax_base(owner: str, att: str):
    """Map a torch attention owner path to the flax attention module path.

    encoder.layers.i / ss_encoder.layers.i  (self_attn)  -> .../attn
    decoder.layers.i  self_attn -> self_attn, multihead_attn -> cross_attn
    tokenizer.layers.i attn -> tokenizer/block_i/attn
    """
    m = re.fullmatch(r"(encoder|ss_encoder)\.layers\.(\d+)", owner)
    if m and att == "self_attn":
        return f"{m.group(1)}/layer_{m.group(2)}/attn"
    m = re.fullmatch(r"decoder\.layers\.(\d+)", owner)
    if m:
        name = {"self_attn": "self_attn",
                "multihead_attn": "cross_attn"}.get(att)
        return f"decoder/layer_{m.group(1)}/{name}" if name else None
    m = re.fullmatch(r"tokenizer\.layers\.(\d+)", owner)
    if m and att == "attn":
        return f"tokenizer/block_{m.group(1)}/attn"
    return None


def torch_state_dict_to_flax(
    sd: Dict[str, Any],
    template_params: Any,
    verbose: bool = True,
) -> Tuple[Any, List[str], List[str]]:
    """Reference torch state_dict -> flax params merged into `template`.

    Reproduces the reference's warm-start semantics
    (experiment.py:213-233): `model.` prefix strip, `quantizer.*` drop,
    shape filter, strict=False merge (missing keys keep fresh init).
    Returns (merged_params, kept_paths, skipped_paths).
    """
    from flax.core import meta as fmeta

    # live train-state params are unboxed; raw model.init params carry
    # Partitioned boxes — normalize so paths line up either way
    template_params = fmeta.unbox(template_params)
    sd = {k: _to_np(v) for k, v in strip_model_prefix(sd).items()}
    cand: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        for path, arr in torch_key_to_flax_entries(k, v, sd):
            cand[path] = arr

    kept: List[str] = []
    skipped: List[str] = []

    def merge(path_tuple, leaf):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path_tuple)
        src = cand.get(key)
        leaf_arr = np.asarray(leaf)
        if src is None:
            skipped.append(key)
            return leaf
        if src.size != leaf_arr.size:
            skipped.append(key)  # shape filter (experiment.py:224-228)
            return leaf
        kept.append(key)
        return src.reshape(leaf_arr.shape).astype(leaf_arr.dtype)

    merged = jax.tree_util.tree_map_with_path(merge, template_params)
    if verbose:
        print(f"[TorchWarmStart] kept={len(kept)} skipped={len(skipped)}")
    return merged, kept, skipped


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a Lightning/.pt checkpoint's state_dict (torch required)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def warm_start_from_torch(path: str, template_params: Any,
                          verbose: bool = True):
    """File-level entry: torch ckpt path -> merged flax params."""
    return torch_state_dict_to_flax(load_torch_checkpoint(path),
                                    template_params, verbose=verbose)


# ---------------------------------------------------------------------
# Inverse: flax -> reference-named torch state_dict
# ---------------------------------------------------------------------
def _flatten_params(tree: Any) -> Dict[str, np.ndarray]:
    from flax.core import meta as fmeta

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            fmeta.unbox(tree))[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf, np.float32)
    return flat


def flax_params_to_torch_state_dict(params: Any,
                                    prefix: str = "") -> Dict[str, np.ndarray]:
    """Flax flagship params -> numpy state_dict in the reference's torch
    naming (suitable for `torch.save({'state_dict': ...})` after adding a
    `model.` prefix). Quantizer state is NOT included — the reference
    drops it on warm-start anyway; export the VQState separately if
    needed."""
    flat = _flatten_params(params)
    sd: Dict[str, np.ndarray] = {}

    def put(k, v):
        sd[prefix + k] = np.asarray(v, np.float32)

    def linear(torch_name, flax_base):
        put(f"{torch_name}.weight", flat[f"{flax_base}/kernel"].T)
        if f"{flax_base}/bias" in flat:
            put(f"{torch_name}.bias", flat[f"{flax_base}/bias"])

    def ln(torch_name, flax_base):
        put(f"{torch_name}.weight", flat[f"{flax_base}/scale"])
        put(f"{torch_name}.bias", flat[f"{flax_base}/bias"])

    def attn(torch_base, flax_base):
        e = flat[f"{flax_base}/q_proj/kernel"].shape[0]
        ws = [flat[f"{flax_base}/{n}/kernel"].reshape(e, -1).T
              for n in ("q_proj", "k_proj", "v_proj")]
        bs = [flat[f"{flax_base}/{n}/bias"].reshape(-1)
              for n in ("q_proj", "k_proj", "v_proj")]
        put(f"{torch_base}.in_proj_weight", np.concatenate(ws, axis=0))
        put(f"{torch_base}.in_proj_bias", np.concatenate(bs))
        put(f"{torch_base}.out_proj.weight",
            flat[f"{flax_base}/out_proj/kernel"].reshape(-1, e).T)
        put(f"{torch_base}.out_proj.bias",
            flat[f"{flax_base}/out_proj/bias"])

    for name in _LINEAR_DIRECT:
        if f"{name}/kernel" in flat:
            linear(name, name)
    for name in _LN_DIRECT:
        if f"{name}/scale" in flat:
            ln(name, name)
    if "query_embed" in flat:
        put("query_embed.weight", flat["query_embed"])
    if "tokenizer/queries" in flat:
        put("tokenizer.queries", flat["tokenizer/queries"])
    if "fuse_fc1/kernel" in flat:
        linear("fuse_mlp.0", "fuse_fc1")
        linear("fuse_mlp.2", "fuse_fc2")
        ln("fuse_mlp.3", "fuse_ln")

    for stack, torch_attn in (("encoder", "self_attn"),
                              ("ss_encoder", "self_attn")):
        i = 0
        while f"{stack}/layer_{i}/ln1/scale" in flat:
            tb, fb = f"{stack}.layers.{i}", f"{stack}/layer_{i}"
            attn(f"{tb}.{torch_attn}", f"{fb}/attn")
            linear(f"{tb}.linear1", f"{fb}/ffn/fc1")
            linear(f"{tb}.linear2", f"{fb}/ffn/fc2")
            ln(f"{tb}.norm1", f"{fb}/ln1")
            ln(f"{tb}.norm2", f"{fb}/ln2")
            i += 1
    i = 0
    while f"decoder/layer_{i}/ln1/scale" in flat:
        tb, fb = f"decoder.layers.{i}", f"decoder/layer_{i}"
        attn(f"{tb}.self_attn", f"{fb}/self_attn")
        attn(f"{tb}.multihead_attn", f"{fb}/cross_attn")
        linear(f"{tb}.linear1", f"{fb}/ffn/fc1")
        linear(f"{tb}.linear2", f"{fb}/ffn/fc2")
        ln(f"{tb}.norm1", f"{fb}/ln1")
        ln(f"{tb}.norm2", f"{fb}/ln2")
        ln(f"{tb}.norm3", f"{fb}/ln3")
        i += 1
    i = 0
    while f"tokenizer/block_{i}/ln_q/scale" in flat:
        tb, fb = f"tokenizer.layers.{i}", f"tokenizer/block_{i}"
        attn(f"{tb}.attn", f"{fb}/attn")
        linear(f"{tb}.ffn.0", f"{fb}/ffn/fc1")
        linear(f"{tb}.ffn.2", f"{fb}/ffn/fc2")
        for nm in ("ln_q", "ln_kv", "ln_o"):
            ln(f"{tb}.{nm}", f"{fb}/{nm}")
        i += 1
    return sd
