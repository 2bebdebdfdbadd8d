#!/usr/bin/env python3
"""Convert a small transformer checkpoint's tensors into the JSON weight
format `graft.llm.TransformerProvider.fromJson` loads (the `tf:` scheme)
— the OFFLINE half of the in-process inference path: the zero-egress JVM
never needs torch/ONNX, because any checkpoint whose tensors fit the
provider's block shape (dim x dim q/k/v projections, H contiguous head
slices, a dim-wide FFN) is converted to plain JSON here, on whatever
machine holds the checkpoint, and shipped as a file.

Supported inputs
  *.npz           numpy archive: one array per tensor name
  *.safetensors   parsed directly (the format is a JSON header + raw
                  little-endian tensor bytes — no safetensors/torch
                  dependency needed)

Tensor naming: either pass tensors already named `blocks.<i>.<field>`
(fields: wq wk wv w1 b1 w2 b2, plus a per-block or global `heads`
scalar), or give --map with lines `src_name -> blocks.<i>.<field>` to
rename checkpoint conventions (e.g. TransformerLens's
`blocks.0.attn.W_Q`, which is also auto-recognized). A HxDxd_h-shaped
attention tensor is flattened to the provider's (dim x dim,
concat-of-heads) layout; `vocab` rows come from --vocab-tokens plus the
unembedding matrix `w_u` (dim x |tokens|) if present.

The provider's arithmetic is IEEE double with pinned fold order, so the
JSON carries full repr() precision — the conversion is lossless for
float32/float64/bfloat16 checkpoints.

ARCHITECTURE CONTRACT: the provider supports BOTH block wirings.
Default (post-LN, ReLU): x -> x+attn(x) -> LN(.)*g+b -> LN+FFN residual.
With --pre-ln (the GPT-2 / TransformerLens wiring): ln1 before the
projections, the attention output added onto the raw residual, ln2
before a (possibly rectangular) GELU FFN, the FFN added onto the
residual — so pre-LN checkpoints' ln1/ln2 tensors ARE auto-mapped under
--pre-ln (blocks.<i>.ln1.w -> ln_g, ln1.b -> ln_b, ln2.w -> ln2_g,
ln2.b -> ln2_b) and every block is emitted with "pre_ln": true and the
--act nonlinearity (default gelu under --pre-ln, relu otherwise).
Without --pre-ln, ln1/ln2 tensors are still skipped with a warning —
they belong to the other wiring; pass --pre-ln instead of --map
re-purposing. Under --pre-ln the attention softmax defaults to "float"
(real q.k/sqrt(d_h) scores + e^x weights — the checkpoint's own
function, replayed via the provider's pinned exp chain, ~1e-13 vs a
torch float64 run); --softmax int selects the legacy integer-softmax.
The faithfulness claim holds for BIAS-FREE attention: the provider has
no attn bias fields, so nonzero blocks.<i>.attn.b_Q/b_K/b_V/b_O tensors
hard-error at conversion (zero them to assert they are immaterial).

Usage:
  python3 tools/make_tf_weights.py ckpt.npz -o weights.json \
      --dim 8 --max-len 8 [--heads 2] [--pre-ln] [--act gelu] \
      [--map mapping.txt] [--vocab-tokens yes,no]
"""
import argparse
import json
import re
import struct
import sys

import numpy as np


def load_safetensors(path):
    """Minimal safetensors reader: u64-LE header length, JSON header with
    per-tensor {dtype, shape, data_offsets}, then the raw buffer."""
    dtypes = {"F64": np.float64, "F32": np.float32, "F16": np.float16,
              "I64": np.int64, "I32": np.int32}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        buf = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        lo, hi = meta["data_offsets"]
        if meta["dtype"] == "BF16":
            # bf16 = float32's top 16 bits: widen via uint16 << 16 (exact)
            arr = (np.frombuffer(buf[lo:hi], dtype=np.uint16)
                   .astype(np.uint32) << 16).view(np.float32)
        elif meta["dtype"] in dtypes:
            arr = np.frombuffer(buf[lo:hi], dtype=dtypes[meta["dtype"]])
        else:
            raise SystemExit(f"{name}: unsupported safetensors dtype "
                             f"{meta['dtype']} (have F64/F32/F16/BF16/"
                             f"I64/I32)")
        out[name] = arr.reshape(meta["shape"]).astype(np.float64)
    return out


def load_tensors(path):
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    with np.load(path) as z:
        return {k: np.asarray(z[k], dtype=np.float64) for k in z.files}


# TransformerLens / HF-style names -> provider fields, applied after --map
# (name pattern, provider field, needs_ffn_transpose) — TL stores the
# MLP as x @ W_in (in, out); the provider computes w1[out][in] row-major,
# so TL-sourced FFN matrices transpose on conversion. TL's ln1/ln2 are
# deliberately NOT auto-mapped: they are the PRE-LN norms of a different
# architecture (see the module docstring) — use --map to re-purpose them
# knowingly.
AUTO_PATTERNS = [
    (re.compile(r"^blocks\.(\d+)\.attn\.W_Q$"), "wq", False),
    (re.compile(r"^blocks\.(\d+)\.attn\.W_K$"), "wk", False),
    (re.compile(r"^blocks\.(\d+)\.attn\.W_V$"), "wv", False),
    (re.compile(r"^blocks\.(\d+)\.attn\.W_O$"), "wo", False),
    (re.compile(r"^blocks\.(\d+)\.mlp\.W_in$"), "w1", True),
    (re.compile(r"^blocks\.(\d+)\.mlp\.b_in$"), "b1", False),
    (re.compile(r"^blocks\.(\d+)\.mlp\.W_out$"), "w2", True),
    (re.compile(r"^blocks\.(\d+)\.mlp\.b_out$"), "b2", False),
    (re.compile(r"^blocks\.(\d+)\.(wq|wk|wv|wo|w1|b1|w2|b2|ln_g|ln_b|"
                r"ln2_g|ln2_b|heads)$"),
     None, False),
]

LN_PRE = re.compile(r"^blocks\.(\d+)\.ln([12])\.([wb])$")
# --pre-ln: TL's ln1 is the provider's (lnG, lnB), ln2 its (ln2G, ln2B)
LN_FIELDS = {("1", "w"): "ln_g", ("1", "b"): "ln_b",
             ("2", "w"): "ln2_g", ("2", "b"): "ln2_b"}


def canonical_name(name, mapping):
    """-> (block, field, needs_ffn_transpose) or None."""
    if name in mapping:
        name = mapping[name]
    for pat, field, t in AUTO_PATTERNS:
        m = pat.match(name)
        if m:
            f = field if field is not None else m.group(2)
            return int(m.group(1)), f, t
    return None


def to_proj(arr, dim, heads, name, layout3d=None):
    """Accept (dim, dim), (heads, dim, d_h) [TL W_Q: d_model x d_head per
    head, transposed to rows-of-output], or (heads, d_h, dim); emit the
    provider's dim x dim row-major list with head h owning output rows
    [h*d_h, (h+1)*d_h). At heads == 1 the two 3-D layouts have the SAME
    shape (1, dim, dim) — an explicit --attn-3d-layout is required then
    (a silent default would transpose single-head checkpoints stored
    d_head-major)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.shape == (dim, dim):
        return a
    dh = dim // heads
    if heads == 1 and a.shape == (1, dim, dim):
        if layout3d == "dmodel-dhead":
            return a[0].T
        if layout3d == "dhead-dmodel":
            return a[0]
        raise SystemExit(
            f"{name}: shape (1,{dim},{dim}) is ambiguous at heads=1 — "
            "pass --attn-3d-layout dmodel-dhead (TransformerLens "
            "[head, d_model, d_head]) or dhead-dmodel "
            "([head, d_head, d_model])")
    if a.shape == (heads, dim, dh):      # TL: [head, d_model, d_head]
        return np.concatenate([a[h].T for h in range(heads)], axis=0)
    if a.shape == (heads, dh, dim):      # [head, d_head, d_model]
        return np.concatenate(list(a), axis=0)
    raise SystemExit(f"{name}: shape {a.shape} does not fit dim={dim} "
                     f"heads={heads} (want ({dim},{dim}), "
                     f"({heads},{dim},{dh}) or ({heads},{dh},{dim}))")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--dim", type=int, required=True)
    ap.add_argument("--max-len", type=int, required=True)
    ap.add_argument("--heads", type=int, default=1,
                    help="heads for every block unless a per-block "
                         "'blocks.<i>.heads' scalar overrides it")
    ap.add_argument("--pre-ln", action="store_true",
                    help="emit pre-LN blocks (GPT-2/TransformerLens "
                         "wiring): auto-map blocks.<i>.ln1/ln2 tensors "
                         "to ln_g/ln_b/ln2_g/ln2_b and default --act to "
                         "gelu")
    ap.add_argument("--act", choices=["relu", "gelu"], default=None,
                    help="FFN nonlinearity for every block (default: "
                         "gelu under --pre-ln, relu otherwise)")
    ap.add_argument("--softmax", choices=["int", "float"], default=None,
                    help="attention softmax for every block: 'float' = "
                         "the real q.k/sqrt(d_h) + e^x softmax (the "
                         "checkpoint's own function, SQL-replayable via "
                         "the provider's pinned exp chain); default: "
                         "float under --pre-ln, int otherwise")
    ap.add_argument("--attn-3d-layout",
                    choices=["dmodel-dhead", "dhead-dmodel"], default=None,
                    help="required for heads=1 checkpoints whose q/k/v "
                         "are stored 3-D (1, dim, dim): which axis is "
                         "d_model (the two layouts coincide in shape)")
    ap.add_argument("--map", help="file of 'src -> blocks.<i>.<field>' lines")
    ap.add_argument("--vocab-tokens",
                    help="comma-separated tokens; vectors from the "
                         "checkpoint's 'w_u' (dim x |tokens|) columns")
    ap.add_argument("--embed-tokens",
                    help="comma-separated tokens (or @file, one per line); "
                         "learned input embeddings from 'embed.W_E' "
                         "(|tokens| x dim) rows in order; 'pos_embed.W_pos' "
                         "(>=max_len x dim), when present, becomes the "
                         "learned positional table")
    args = ap.parse_args()

    mapping = {}
    if args.map:
        for line in open(args.map):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            src, dst = [p.strip() for p in line.split("->")]
            mapping[src] = dst

    tensors = load_tensors(args.checkpoint)
    blocks = {}
    transpose_ffn = set()
    ln_f = {}
    for name, arr in tensors.items():
        # the checkpoint's FINAL LayerNorm (TL ln_final) — the head path's
        # norm, mapped under --pre-ln like the block norms
        m_f = re.match(r"^ln_final\.([wb])$", mapping.get(name, name))
        if m_f:
            if args.pre_ln:
                ln_f["ln_f_g" if m_f.group(1) == "w" else "ln_f_b"] = arr
            else:
                print(f"warning: {name} (ln_final) skipped under the "
                      "post-LN wiring; pass --pre-ln", file=sys.stderr)
            continue
        ln_hit = LN_PRE.match(mapping.get(name, name))
        if ln_hit:
            if args.pre_ln:
                bi = int(ln_hit.group(1))
                field = LN_FIELDS[(ln_hit.group(2), ln_hit.group(3))]
                blocks.setdefault(bi, {})[field] = arr
            else:
                print(f"warning: {name} is a pre-LN tensor — skipped "
                      "under the default post-LN wiring; pass --pre-ln "
                      "to convert the checkpoint architecture-faithfully",
                      file=sys.stderr)
            continue
        hit = canonical_name(name, mapping)
        if hit is None:
            # ADVICE r20: TransformerLens/GPT-2-class checkpoints carry
            # attention biases (blocks.<i>.attn.b_Q/b_K/b_V/b_O) the
            # provider has no fields for — dropping them SILENTLY would
            # emit a converted model that computes a materially different
            # function with no diagnostic. Hard-error so the gap is
            # explicit; the faithfulness claim holds for bias-free
            # attention only.
            if re.search(r"\battn\.b_[QKVO]\b", name) or \
               re.search(r"\.attn\.(bq|bk|bv|bo)\b", name):
                # an all-zero bias is immaterial by definition — the
                # docstring prescribes zeroing as the way to assert that,
                # so zeroed tensors must convert (skip), and only a
                # NONZERO bias is the silent-function-change hard error
                if np.any(arr):
                    raise SystemExit(
                        f"{name}: nonzero attention biases are not "
                        "supported by the provider (TfBlock has no "
                        "bq/bk/bv/bo fields) — the converted model would "
                        "silently compute a different function. Zero "
                        "these tensors in the checkpoint to assert they "
                        "are immaterial, or extend TfBlock first. "
                        "Conversion is architecture-faithful for "
                        "BIAS-FREE attention only.")
            continue
        bi, field, t = hit
        blocks.setdefault(bi, {})[field] = arr
        if t:
            transpose_ffn.add((bi, field))
    if not blocks:
        raise SystemExit("no tensors matched blocks.<i>.<field> (use --map)")

    out_blocks = []
    for bi in range(max(blocks) + 1):
        b = blocks.get(bi)
        if b is None:
            raise SystemExit(f"missing block {bi} (blocks must be contiguous)")
        missing = [f for f in ("wq", "wk", "wv", "w1", "b1", "w2", "b2")
                   if f not in b]
        if missing:
            raise SystemExit(f"block {bi}: missing {missing}")
        heads = int(b["heads"]) if "heads" in b else args.heads
        if args.dim % heads != 0:
            raise SystemExit(f"block {bi}: heads={heads} must divide "
                             f"dim={args.dim}")
        ob = {"heads": heads}
        if args.pre_ln:
            ob["pre_ln"] = True
        act = args.act if args.act else ("gelu" if args.pre_ln else "relu")
        if act != "relu":
            ob["act"] = act
        sm = args.softmax if args.softmax else (
            "float" if args.pre_ln else "int")
        if sm != "int":
            ob["softmax"] = sm
        for f in ("wq", "wk", "wv"):
            ob[f] = to_proj(b[f], args.dim, heads, f"blocks.{bi}.{f}",
                            layout3d=args.attn_3d_layout).tolist()
        if "wo" in b:
            # TL W_O is [head, d_head, d_model]: out_d = sum_c a[c]*WO[c,d]
            # with c = h*d_h + j — flatten heads along the INPUT axis then
            # transpose to the provider's row-major (out, in) layout
            a = np.asarray(b["wo"], dtype=np.float64)
            if a.shape == (args.dim, args.dim):
                ob["wo"] = a.tolist()
            else:
                dh = args.dim // heads
                if a.shape != (heads, dh, args.dim):
                    raise SystemExit(f"blocks.{bi}.wo: shape {a.shape}, want "
                                     f"({args.dim},{args.dim}) or "
                                     f"({heads},{dh},{args.dim})")
                ob["wo"] = np.concatenate(list(a), axis=0).T.tolist()
        for f in ("ln_g", "ln_b", "ln2_g", "ln2_b"):
            if f in b:
                v = np.asarray(b[f], dtype=np.float64).reshape(-1)
                if v.shape != (args.dim,):
                    raise SystemExit(f"blocks.{bi}.{f}: shape {v.shape}, "
                                     f"want ({args.dim},)")
                ob[f] = v.tolist()
        # the FFN may be RECTANGULAR (real checkpoints: hid = 4*dim);
        # hid comes from b1's length. TL stores the MLP as x @ W
        # (in, out); the provider's FFN is row-major (out, in) —
        # transpose TL-sourced matrices: W_in (dim, hid) -> w1 (hid, dim),
        # W_out (hid, dim) -> w2 (dim, hid).
        hid = np.asarray(b["b1"], dtype=np.float64).reshape(-1).shape[0]
        for f, want, tl_want in (("w1", (hid, args.dim), (args.dim, hid)),
                                 ("w2", (args.dim, hid), (hid, args.dim))):
            m = np.asarray(b[f], dtype=np.float64)
            if (bi, f) in transpose_ffn:
                if m.shape != tl_want:
                    raise SystemExit(f"blocks.{bi}.{f}: shape {m.shape}, "
                                     f"want {tl_want} (TL layout, "
                                     f"hid={hid} from b1)")
                m = m.T
            elif m.shape != want:
                raise SystemExit(f"blocks.{bi}.{f}: shape {m.shape}, want "
                                 f"{want} (hid={hid} from b1)")
            ob[f] = m.tolist()
        for f, n in (("b1", hid), ("b2", args.dim)):
            v = np.asarray(b[f], dtype=np.float64).reshape(-1)
            if v.shape != (n,):
                raise SystemExit(f"blocks.{bi}.{f}: shape {v.shape}, want "
                                 f"({n},)")
            ob[f] = v.tolist()
        out_blocks.append(ob)

    doc = {"dim": args.dim, "max_len": args.max_len, "blocks": out_blocks}
    for f, arr in ln_f.items():
        v = np.asarray(arr, dtype=np.float64).reshape(-1)
        if v.shape != (args.dim,):
            raise SystemExit(f"ln_final.{f}: shape {v.shape}, "
                             f"want ({args.dim},)")
        doc[f] = v.tolist()
    if args.vocab_tokens:
        toks = args.vocab_tokens.split(",")
        if "w_u" not in tensors:
            raise SystemExit("--vocab-tokens needs a 'w_u' (dim x |tokens|) "
                             "unembedding tensor")
        wu = np.asarray(tensors["w_u"], dtype=np.float64)
        if wu.shape != (args.dim, len(toks)):
            raise SystemExit(f"w_u: shape {wu.shape}, want "
                             f"({args.dim},{len(toks)})")
        doc["vocab"] = {t: wu[:, i].tolist() for i, t in enumerate(toks)}

    if args.embed_tokens:
        toks = (open(args.embed_tokens[1:]).read().split()
                if args.embed_tokens.startswith("@")
                else args.embed_tokens.split(","))
        if "embed.W_E" not in tensors:
            raise SystemExit("--embed-tokens needs an 'embed.W_E' "
                             "(|tokens| x dim) tensor")
        we = np.asarray(tensors["embed.W_E"], dtype=np.float64)
        if we.shape != (len(toks), args.dim):
            raise SystemExit(f"embed.W_E: shape {we.shape}, want "
                             f"({len(toks)},{args.dim})")
        doc["embed"] = {t: we[i].tolist() for i, t in enumerate(toks)}
    if "pos_embed.W_pos" in tensors:
        wp = np.asarray(tensors["pos_embed.W_pos"], dtype=np.float64)
        if wp.ndim != 2 or wp.shape[0] < args.max_len or \
                wp.shape[1] != args.dim:
            raise SystemExit(f"pos_embed.W_pos: shape {wp.shape}, want "
                             f"(>={args.max_len},{args.dim})")
        doc["pos"] = wp[:args.max_len].tolist()

    # repr-precision floats: json.dump's default float repr is shortest
    # round-trip in py3 — lossless back into IEEE double in the JVM
    with open(args.out, "w") as f:
        json.dump(doc, f)
    n = sum(np.asarray(v).size for b in out_blocks for k, v in b.items()
            if k != "heads")
    print(f"wrote {args.out}: {len(out_blocks)} block(s), {n} weights")


if __name__ == "__main__":
    main()
