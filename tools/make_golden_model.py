#!/usr/bin/env python3
"""Produce the committed golden NER model fixture.

Reproduces the on-disk layout of the reference converter
(/root/reference/scripts/convert_ner_to_ggml.py:37-89) over a simulated tiny
BertForTokenClassification state dict, without torch/transformers: same header
field order, same vocab packing, same per-tensor rule (ftype==1 + name ends
".weight" + 2-D => float16, else float32), same "iii" tensor header, reversed
dims, name bytes, then raw data. Simulated-dict quirks the converter handles
are exercised: "bert."-prefix stripping, the embeddings.position_ids skip, and
pooler tensors (which the converter DOES write and the repo's loader must seek
past as unknown names).

Appendix beyond the converter's own output: one hand-quantized Q4_0 tensor
(embeddings.LayerNorm.bias) exercising the reader path the reference maps
non-F32/F16 ftypes to (ner_model.cpp:278, public ggml block_q4_0 layout) —
the converter itself never emits Q4_0, so this tensor is withheld from the
simulated dict and appended manually.

All values sit on a 1/16 (or 1/64 for Q4_0) grid so float16 narrowing is
exact and the Scala spec can assert bit-equal floats.

Deterministic: no RNG, no timestamps. Output is committed at
src/test/resources/graft/ner/golden_converter_model.bin; rerunning this
script must reproduce it byte-for-byte.
"""
import struct
import numpy as np
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/graft/ner/golden_converter_model.bin")

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "duck", "##db", "spark", "##s",
         "data", "graft", "the", "a", "new", "york", "bob", "!"]
N_VOCAB, N_MAX, N_EMBD, N_INTER, N_HEAD, N_LAYER, N_LABELS = \
    len(VOCAB), 16, 32, 64, 2, 1, 9
FTYPE = 1  # default converter mode: 2-D weights as f16


def pat(shape, t):
    """deterministic 1/16-grid fill; t = tensor enumeration index"""
    n = int(np.prod(shape))
    v = (((np.arange(n) + t) % 17) - 8) / 16.0
    return v.reshape(shape)


def ln_weight(shape, t):
    """LayerNorm gamma ~1 so the encoder's normalization stays realistic"""
    n = int(np.prod(shape))
    return (1.0 + ((((np.arange(n) + t) % 5) - 2) / 16.0)).reshape(shape)


# --- simulated BertForTokenClassification.state_dict(), HF naming/shapes ---
state = {}
t = 0
def add(name, shape, gen=pat):
    global t
    state[name] = gen(shape, t)
    t += 1

add("bert.embeddings.word_embeddings.weight", (N_VOCAB, N_EMBD))
add("bert.embeddings.position_embeddings.weight", (N_MAX, N_EMBD))
add("bert.embeddings.token_type_embeddings.weight", (2, N_EMBD))
add("bert.embeddings.LayerNorm.weight", (N_EMBD,), ln_weight)
# embeddings.LayerNorm.bias deliberately withheld -> Q4_0 appendix below
add("bert.embeddings.position_ids", (1, N_MAX))  # converter skips this name
for sfx, shape in [
        ("attention.self.query.weight", (N_EMBD, N_EMBD)),
        ("attention.self.query.bias", (N_EMBD,)),
        ("attention.self.key.weight", (N_EMBD, N_EMBD)),
        ("attention.self.key.bias", (N_EMBD,)),
        ("attention.self.value.weight", (N_EMBD, N_EMBD)),
        ("attention.self.value.bias", (N_EMBD,)),
        ("attention.output.dense.weight", (N_EMBD, N_EMBD)),
        ("attention.output.dense.bias", (N_EMBD,)),
        ("attention.output.LayerNorm.weight", (N_EMBD,)),
        ("attention.output.LayerNorm.bias", (N_EMBD,)),
        ("intermediate.dense.weight", (N_INTER, N_EMBD)),
        ("intermediate.dense.bias", (N_INTER,)),
        ("output.dense.weight", (N_EMBD, N_INTER)),
        ("output.dense.bias", (N_EMBD,)),
        ("output.LayerNorm.weight", (N_EMBD,)),
        ("output.LayerNorm.bias", (N_EMBD,))]:
    gen = ln_weight if sfx.endswith("LayerNorm.weight") else pat
    add(f"bert.encoder.layer.0.{sfx}", shape, gen)
add("bert.pooler.dense.weight", (N_EMBD, N_EMBD))   # written; loader skips
add("bert.pooler.dense.bias", (N_EMBD,))            # written; loader skips
add("classifier.weight", (N_LABELS, N_EMBD))
add("classifier.bias", (N_LABELS,))

os.makedirs(os.path.dirname(OUT), exist_ok=True)
fout = open(OUT, "wb")

# header — converter lines 37-46
fout.write(struct.pack("i", 0x67676d6c))
fout.write(struct.pack("i", N_VOCAB))
fout.write(struct.pack("i", N_MAX))
fout.write(struct.pack("i", N_EMBD))
fout.write(struct.pack("i", N_INTER))
fout.write(struct.pack("i", N_HEAD))
fout.write(struct.pack("i", N_LAYER))
fout.write(struct.pack("i", FTYPE))
fout.write(struct.pack("i", N_LABELS))

# vocab — converter lines 48-55 (id order)
for word in VOCAB:
    data = bytes(word, "utf-8")
    fout.write(struct.pack("i", len(data)))
    fout.write(data)

# tensors — converter lines 57-89
for name in state.keys():
    data = np.squeeze(state[name])
    clean_name = name[5:] if name.startswith("bert.") else name
    if clean_name in ["embeddings.position_ids"]:
        continue
    n_dims = len(data.shape)
    if FTYPE == 1 and clean_name.endswith(".weight") and n_dims == 2:
        data = data.astype(np.float16)
        l_type = 1
    else:
        data = data.astype(np.float32)
        l_type = 0
    str_name = clean_name.encode("utf-8")
    fout.write(struct.pack("iii", n_dims, len(str_name), l_type))
    for i in range(n_dims):
        fout.write(struct.pack("i", data.shape[n_dims - 1 - i]))
    fout.write(str_name)
    data.tofile(fout)

# Q4_0 appendix (not converter output): embeddings.LayerNorm.bias as one
# block_q4_0 — f16 scale d then 16 nibble bytes, low nibbles = values 0..15,
# high nibbles = values 16..31, value = (q - 8) * d. bias[k] = ((k%16)-8)/64
# => q = k % 16, d = 1/64.
name = b"embeddings.LayerNorm.bias"
fout.write(struct.pack("iii", 1, len(name), 2))
fout.write(struct.pack("i", N_EMBD))
fout.write(name)
fout.write(np.float16(1 / 64.0).tobytes())
fout.write(bytes((j & 0xF) | ((j & 0xF) << 4) for j in range(16)))

fout.close()
print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
