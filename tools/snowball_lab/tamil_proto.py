#!/usr/bin/env python3
# Tamil snowball prototype v4 — pipeline of suffix families, each followed
# by its own fix pass; per-rule char-length gates measured by oracle probes.
import sys
PU = "்"
SIGNS = set("ாிீுூெேைொோௌ")
BASE = lambda c: "க" <= c <= "ஹ"

def fix_endings(w, gated=True, vet=False):
    """repeat loop of ending fixes; gates are current-length thresholds."""
    while True:
        n = len(w)
        w2 = None
        def rule(sfx, rep, gate):
            nonlocal w2
            if w2 is None and w.endswith(sfx) and (not gated or n > gate):
                cand = w[: len(w) - len(sfx)] + rep
                if cand != w:
                    w2 = cand
        # doubled/sandhi clusters first (longest match semantics by order)
        if vet:
            rule("த்த்", "ம்", 3)
        rule("ட்ட்", "டு", 3)
        rule("ற்ற்", "", 3)
        rule("ன்ற்", "ல்", 3)
        rule("ட்க்", "ள்", 3)
        rule("ற்க்", "ல்", 3)
        rule("ர்க்", PU, 3)
        rule("க்க்", "க்", 3)
        rule("ல்ல்", "ல்", 3)
        rule("ன்ன்", "ன்", 3)
        rule("ள்ள்", "ள்", 3)
        rule("ங்", "ம்", 4)
        rule("ல்", PU, 3)
        rule("ள்", PU, 3)
        if vet:
            rule("ன்", "", 3)
        for c in "கசடதநபவற":
            rule(c + PU, "", 4)
        # bare consonants (inherent-a)
        if len(w) >= 2 and (w[-2] == PU or w[-2] in SIGNS or BASE(w[-2])):
            for c in "யவ":
                rule(c, "", 3)
            for c in "னபத":
                rule(c, "", 5)
        rule("ீ", "ி", 5)
        if w2 is None:
            return w
        w = w2

def fix_ungated(w):
    return fix_endings(w, gated=False)

def longest(w, sfxs):
    best = None
    for s in sfxs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best

def stem(word):
    w = word
    # entry fix pass
    w = fix_endings(w)

    # question prefixes: [அஇஉஎ]C் with doubling-sandhi C; then a strip of
    # one final {ம் ு ி} + ungated fix
    if len(w) >= 5 and w[0] in "அஇஉஎ" and w[1] in "கசதபவநமயஙஞ" and w[2] == PU:
        w = w[3:]
        if w.endswith("ம்"):
            w = fix_ungated(w[:-2])
        elif w and w[-1] in ("ு", "ி"):
            w = fix_ungated(w[:-1])

    # question suffixes ோ ே ா -> ் (len > 4), then fix
    if len(w) > 4 and w and w[-1] in "ோோ":
        w = fix_endings(w[:-1] + PU)

    # tense suffixes
    if len(w) > 4:
        dels = ["கிறான்","கிறாள்","கிறார்கள்","கிறார்","கிறேன்","கிறோம்",
                "கிறீர்கள்","கிறது","கின்றான்","கின்றேன்","கின்றது","கின்றன",
                "ந்தான்","ந்தாள்","ந்தேன்","ந்தது","ந்த",
                "த்தான்","த்தாள்","த்தேன்","த்தது","த்த",
                "னான்","னாள்","வேன்","வான்","வாள்","வார்கள்",
                "ப்பேன்","ப்பான்","தான்"]
        pers = ["ேன்","ான்","ாள்","ார்","ோம்"]
        s = longest(w, dels + pers)
        if s is not None:
            if s in pers:
                w = fix_endings(w[: len(w) - len(s)] + PU)
            else:
                w = w[: len(w) - len(s)]
        elif w.endswith("து") and len(w) > 4:
            w = w[:-2]

    # plural: sandhi specials then plain deletion (no fix pass)
    if len(w) > 4:
        if w.endswith("ட்கள்"):
            w = w[:-5] + "ள்"
        elif w.endswith("ற்கள்"):
            w = w[:-5] + "ல்"
        elif w.endswith("ர்கள்"):
            w = fix_ungated(w[:-5])
        elif w.endswith("கள்"):
            w = w[:-3]

    # um / emphatic combinations
    if len(w) > 4:
        ums = [("ாகியும்", ""), ("ையும்", "ை"), ("ாலும்", PU), ("ிலும்", PU),
               ("ோடும்", PU), ("ும்", PU)]
        s = longest(w, [u[0] for u in ums])
        if s is not None:
            rep = dict(ums)[s]
            w = fix_endings(w[: len(w) - len(s)] + rep, vet=True)

    # common word endings
    if len(w) > 4:
        commons = [("ிலிருந்து", "ில்"), ("ிருந்து", ""),
                   ("ுடன்", PU), ("ிடம்", PU), ("ாகிய", PU), ("ாய", PU),
                   ("ின்றி", PU), ("ாக", PU), ("ான", PU), ("ாத", PU),
                   ("ாது", PU), ("ாமல்", PU), ("ாய்", PU), ("ென", PU),
                   ("ேயான", PU), ("வைகள்", ""), ("வை", ""),
                   ("ியது", "ி"), ("ிய", "ி")]
        s = longest(w, [c[0] for c in commons])
        if s is not None:
            rep = dict(commons)[s]
            w = fix_endings(w[: len(w) - len(s)] + rep)

    # vetrumai urupukal (case markers) — their fix pass also simplifies
    # த்த் -> ம் and deletes a final ன்
    if len(w) > 4:
        vets = [("ுக்கு", PU), ("ோடு", PU), ("ால்", PU), ("ில்", PU),
                ("ின்", PU), ("ை", PU), ("ீர்கள்", PU), ("க்கு", "")]
        s = longest(w, [v[0] for v in vets])
        if s is not None:
            rep = dict(vets)[s]
            w = w[: len(w) - len(s)] + rep
            if rep == PU:
                w = fix_endings(w, vet=True)
    return w

if __name__ == "__main__":
    tsv = sys.argv[1] if len(sys.argv) > 1 else "tamil_oracle.tsv"
    bad = []; total = 0
    for line in open(tsv):
        wd, want = line.rstrip("\n").split("\t")
        total += 1
        got = stem(wd)
        if got != want: bad.append((wd, got, want))
    print(f"mismatches: {len(bad)}/{total}")
    from collections import Counter
    c = Counter(w[-3:] for w, _, _ in bad)
    for k, n in c.most_common(15): print(" ", k, n)
    for wd, got, want in bad[:36]:
        print(f"  {wd}: got={got} want={want}")
