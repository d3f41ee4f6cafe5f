#!/usr/bin/env python3
# Tamil snowball prototype v5 — per-family fix tables with per-family
# length gates (the "pipeline model v2" in README.md), fit to the oracle.
import sys
PU = "்"
SIGNS = set("ாிீுூெேைொோௌ")

def fix(w, rules, gate=0, repeat=True):
    """rules: list of (suffix, replacement); longest match per iteration;
    fires only while len(w) > gate."""
    while True:
        if len(w) <= gate:
            return w
        best = None
        for s, r in rules:
            if w.endswith(s) and (best is None or len(s) > len(best[0])):
                best = (s, r)
        if best is None:
            return w
        s, r = best
        w2 = w[: len(w) - len(s)] + r
        if w2 == w:
            return w
        w = w2
        if not repeat:
            return w

# vetrumai fix: gated len>4 per step; no ல்->்
VET = [("த்த்", "ம்"), ("ட்ட்", "டு"), ("ற்ற்", ""), ("ன்ற்", "ல்"),
       ("ட்க்", "ள்"), ("ற்க்", "ல்"), ("ர்க்", PU), ("க்க்", "க்"),
       ("ல்ல்", "ல்"), ("ண்ண்", "ண்"), ("ள்ள்", "ள்"), ("ன்ன்", "ன்"),
       ("ள்", PU), ("ங்", "ம்"),
       ("க்", ""), ("ச்", ""), ("ட்", ""), ("த்", ""), ("ந்", ""),
       ("ப்", ""), ("வ்", ""), ("ற்", ""), ("ய்", ""), ("ன்", ""),
       ("ய", ""), ("வ", "")]
# general (bare-word / question / tense-person) fix
FULL = [("ட்ட்", "டு"), ("ற்ற்", ""), ("ன்ற்", "ல்"), ("ட்க்", "ள்"),
        ("ற்க்", "ல்"), ("ர்க்", PU), ("க்க்", "க்"),
        ("ல்ல்", "ல்"), ("ண்ண்", "ண்"), ("ள்ள்", "ள்"), ("ன்ன்", "ன்"),
        ("ங்", "ம்"), ("ல்", PU), ("ள்", PU),
        ("க்", ""), ("ச்", ""), ("ட்", ""), ("த்", ""), ("ந்", ""),
        ("ப்", ""), ("வ்", ""), ("ற்", "")]
# ungated cascade (um / ுடன் / ர்கள் paths): delete consonants down to a sign
UNG = [("ட்ட்", "டு"), ("ற்ற்", ""), ("ன்ற்", "ல்"), ("ட்க்", "ள்"),
       ("ற்க்", "ல்"), ("க்க்", "க்"),
       ("க்", ""), ("ச்", ""), ("ட்", ""), ("த்", ""), ("ந்", ""),
       ("ப்", ""), ("வ்", ""), ("ற்", ""),
       ("க", ""), ("ச", ""), ("ட", ""), ("த", ""), ("ந", ""), ("ப", ""),
       ("ய", ""), ("வ", ""), ("ன", "")]

def longest(w, sfxs):
    best = None
    for s in sfxs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best

def barefix(w):
    """fix pass for words no suffix family touched."""
    while True:
        n = len(w)
        nw = None
        for s, r, g in [("ட்ட்", "டு", 3), ("ற்ற்", "", 3), ("ன்ற்", "ல்", 3),
                        ("ட்க்", "ள்", 3), ("ற்க்", "ல்", 3), ("ர்க்", PU, 3),
                        ("க்க்", "க்", 3),
                        ("ல்ல்", "ல்", 3), ("ண்ண்", "ண்", 3), ("ள்ள்", "ள்", 3),
                        ("ன்ன்", "ன்", 3), ("ங்", "ம்", 4),
                        ("ல்", PU, 3), ("ள்", PU, 3),
                        ("க்", "", 4), ("ச்", "", 4), ("ட்", "", 4),
                        ("த்", "", 4), ("ந்", "", 4), ("ப்", "", 4),
                        ("வ்", "", 4), ("ற்", "", 4),
                        ("ய", "", 3), ("வ", "", 3),
                        ("ன", "", 5), ("ப", "", 5), ("த", "", 5),
                        ("ீ", "ி", 5)]:
            if n > g and w.endswith(s):
                cand = w[: len(w) - len(s)] + r
                if cand != w:
                    nw = cand
                    break
        if nw is None:
            return w
        w = nw

def stem(word):
    w = word
    fired = False

    # question prefixes + command-ish strip + ungated fix
    if len(w) >= 5 and w[0] in "அஇஉஎ" and w[1] in "கசதபவநமயஙஞ" and w[2] == PU:
        w = w[3:]
        fired = True
        if w.endswith("னம்"):
            w = fix(w[:-2], UNG)
        elif (w.endswith("கு") or w.endswith("து")) and len(w) >= 3:
            w = fix(w[:-1] + PU, UNG)
        elif w.endswith("வி"):
            w = fix(w[:-1] + PU, UNG)

    # question suffixes ோ/ே/ா -> ் (len>4) + FULL fix
    if len(w) > 4 and w and w[-1] in "ோோ":
        w = fix(w[:-1] + PU, FULL, gate=3)
        fired = True

    # tense
    if len(w) > 4:
        dels = ["கிறான்", "கிறாள்", "கிறார்கள்", "கிறார்", "கிறேன்",
                "கிறோம்", "கிறீர்கள்", "கிறது", "கின்றான்", "கின்றேன்",
                "கின்றது", "கின்றன", "ந்தான்", "ந்தாள்", "ந்தேன்", "ந்தது",
                "ந்த", "த்தான்", "த்தாள்", "த்தேன்", "த்தது", "த்த",
                "னான்", "னாள்", "வேன்", "வான்", "வாள்", "வார்கள்",
                "ப்பேன்", "ப்பான்", "தான்"]
        pers = ["ேன்", "ான்", "ாள்", "ார்", "ோம்"]
        s = longest(w, dels + pers)
        if s is not None:
            fired = True
            if s in pers and s not in dels:
                w = fix(w[: len(w) - len(s)] + PU, FULL, gate=3)
            else:
                w = w[: len(w) - len(s)]

    # plural (no fix except sandhi specials)
    if len(w) > 4:
        if w.endswith("ட்கள்"):
            w, fired = w[:-5] + "ள்", True
        elif w.endswith("ற்கள்"):
            w, fired = w[:-5] + "ல்", True
        elif w.endswith("ங்கள்") and len(w) >= 8:
            w, fired = w[:-5] + "ம்", True
        elif w.endswith("ர்கள்"):
            w, fired = fix(w[:-5], UNG), True
        elif w.endswith("கள்"):
            w, fired = w[:-3], True

    # um / emphatic
    if len(w) > 4:
        ums = [("ாகியும்", ""), ("ையும்", "ை"), ("ாலும்", PU),
               ("ிலும்", PU), ("ோடும்", PU), ("ும்", PU)]
        s = longest(w, [u[0] for u in ums])
        if s is not None:
            fired = True
            w = fix(w[: len(w) - len(s)] + dict(ums)[s], UNG)

    # common endings
    if len(w) > 4:
        commons = [("ிலிருந்து", "ில்"), ("ிருந்து", ""), ("ுடன்", PU),
                   ("ிடம்", PU), ("ாகிய", PU), ("ாய", PU), ("ின்றி", PU),
                   ("ாக", PU), ("ான", PU), ("ாத", PU), ("ாது", PU),
                   ("ாமல்", PU), ("ாய்", PU), ("ென", PU), ("ேயான", PU),
                   ("வைகள்", ""), ("வை", ""), ("ியது", "ி"), ("ிய", "ி")]
        s = longest(w, [c[0] for c in commons])
        if s is not None:
            fired = True
            w = fix(w[: len(w) - len(s)] + dict(commons)[s], UNG)

    # vetrumai
    if len(w) > 4:
        vets = [("ுக்கு", PU), ("ோடு", PU), ("ால்", PU), ("ில்", PU),
                ("ின்", PU), ("ை", PU), ("ீர்கள்", PU), ("க்கு", "")]
        s = longest(w, [v[0] for v in vets])
        if s is not None:
            fired = True
            rep = dict(vets)[s]
            w = w[: len(w) - len(s)] + rep
            if rep == PU:
                w = fix(w, VET, gate=4)

    if not fired:
        w = barefix(w)
    return w

if __name__ == "__main__":
    tsv = sys.argv[1] if len(sys.argv) > 1 else "tamil_oracle.tsv"
    bad = []
    total = 0
    for line in open(tsv):
        wd, want = line.rstrip("\n").split("\t")
        total += 1
        got = stem(wd)
        if got != want:
            bad.append((wd, got, want))
    print(f"mismatches: {len(bad)}/{total}")
    from collections import Counter
    c = Counter(w[-3:] for w, _, _ in bad)
    for k, n in c.most_common(15):
        print(" ", k, n)
    for wd, got, want in bad[:36]:
        print(f"  {wd}: got={got} want={want}")
