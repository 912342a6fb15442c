"""Exhaustive check: cyclic within-row butterfly routing.

Row of L lanes, kept mask m. Element at lane l with rank j (0-based among
kept, ascending l) must land at lane (phi + j) mod L. Down-shift butterfly
with WRAPPING rolls: at level s (1,2,4,...,L/2), slot t reads slot (t+s)%L;
take if that word's distance field has bit s set; moving packet vacates its
source. Distance d = (l - phi - j) mod L. Holes and in-place packets are 0.

Conflict = a real packet overwritten while still carrying distance != 0,
or final layout wrong. Checks random + adversarial masks x all phases.
"""
import itertools
import numpy as np

def route(mask, phi, L=16):
    lanes = np.nonzero(mask)[0]
    k = len(lanes)
    word = np.zeros(L, dtype=np.int64)  # (d << 8) | (l+1) cargo; 0 = hole
    for j, l in enumerate(lanes):
        d = (l - phi - j) % L
        word[l] = (d << 8) | (l + 1)
    s = 1
    while s < L:
        se = s << 8
        cd = np.roll(word, -s)  # slot t reads slot t+s (wrapping)
        take = (cd & se) != 0
        newword = word.copy()
        # moving packets land: slot t receives cd - se if take
        newword[take] = cd[take] - se
        # slots NOT receiving: keep own word unless own packet moved out
        own_moves = (word & se) != 0
        vacated = own_moves & ~take
        newword[vacated] = 0
        # conflict check: a slot receiving while its own packet hasn't moved
        conflict = take & (word != 0) & ~own_moves
        if conflict.any():
            return None
        word = newword
        s <<= 1
    # verify
    out = np.zeros(L, dtype=np.int64)
    for t in range(L):
        if word[t] != 0:
            assert (word[t] >> 8) == 0, f"residual distance at {t}"
            out[t] = word[t] & 0xFF
    expect = np.zeros(L, dtype=np.int64)
    for j, l in enumerate(lanes):
        expect[(phi + j) % L] = l + 1
    return np.array_equal(out, expect)

L = 16
bad = 0
for mbits in range(1 << L):
    mask = np.array([(mbits >> i) & 1 for i in range(L)], bool)
    for phi in range(L):
        r = route(mask, phi, L)
        if r is not True:
            bad += 1
            if bad <= 5:
                print("FAIL", f"mask={mbits:016b}", f"phi={phi}", "conflict" if r is None else "wrong")
print("total fail:", bad, "of", (1 << L) * L)
