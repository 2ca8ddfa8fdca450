#!/usr/bin/env python3
"""Independent replay of the q119 aHash contract — emits the 7 hash
constants embedded in the q119_image_hash_dedup oracle SQL.

The q119 fixture (Multimodal.syntheticPngMedia) renders, per doc, a
16x16 greyscale pattern keyed by k = doc_id % 7:

    v(x, y) = ((x*(k+3) + y*(2k+5)) % 7) * 32    (+24 for odd ids)

and Multimodal.aHashOf computes a 64-bit average-hash: 8x8
nearest-center sample (sx = 2c+1, sy = 2r+1 on a 16x16 source), luma
(299r + 587g + 114b)//1000 = v on greyscale, bit i = r*8+c set iff
luma*64 > sum(luma). The +24 brightness shift moves every luma AND the
mean by the same amount, so the hash depends only on k — which is what
makes a constant-table oracle possible. This script re-derives the
constants from the published formulas only (no Scala involved); if the
Scala decode/hash drifts, the oracle mismatch is the gate firing.
"""

for k in range(7):
    luma = []
    for i in range(64):
        r, c = i // 8, i % 8
        sy, sx = 2 * r + 1, 2 * c + 1
        v = ((sx * (k + 3) + sy * (2 * k + 5)) % 7) * 32
        luma.append(v)
    s = sum(luma)
    h = 0
    for i in range(64):
        if luma[i] * 64 > s:
            h |= 1 << i
    signed = h - (1 << 64) if h >= (1 << 63) else h
    print(k, signed)
