#!/usr/bin/env python3
# Tamil snowball prototype v3.
import sys
PU = "்"
BARE = set("கஙசஞடணதநபமயரலவழளறன")

FULL = [
    ("ல்ல்", "ல்", None), ("ன்ன்", "ன்", None), ("ள்ள்", "ள்", None),
    ("ட்ட்", "டு", None), ("ற்ற்", "", None), ("ன்ற்", "ல்", None),
    ("ட்க்", "ள்", None), ("ற்க்", "ல்", None),
    ("ங்", "ம்", None), ("ல்", PU, 4),
    ("க்", "", None), ("ச்", "", None), ("ட்", "", None), ("த்", "", None),
    ("ந்", "", None), ("ப்", "", None), ("வ்", "", None), ("ற்", "", None),
]
VET = [("த்த்", "ம்", None)] + FULL
WEAK = [
    ("ட்ட்", "டு", None), ("ற்ற்", "", None), ("ன்ற்", "ல்", None),
    ("க்", "", None), ("ச்", "", None), ("ட்", "", None), ("த்", "", None),
    ("ந்", "", None), ("ப்", "", None), ("வ்", "", None), ("ற்", "", None),
]
TENSE = [("ட்ட்", "டு", None), ("ற்ற்", "", None), ("ன்ற்", "ல்", None)]

def dedup_pu(w):
    while w.endswith("்்"):
        w = w[:-1]
    return w

def fix(w, rules, repeat):
    w = dedup_pu(w)
    while True:
        best = None
        for s, r, g in rules:
            if w.endswith(s) and (best is None or len(s) > len(best[0])):
                best = (s, r, g)
        if best is None: return w
        s, r, g = best
        if g is not None and len(w) <= g: return w
        w2 = w[:-len(s)] + r
        if w2 == w: return w
        w = w2
        if not repeat: return w

# entry fix: shorten final long vowels; delete trailing bare consonants of S1
S1 = set("கசடதநபயவனற")
LONG2SHORT = {"ீ":"ி", "ூ":"ு", "ா":"ா"}  # ா handled by question suffix

def entry_fix(w):
    changed = True
    while changed:
        changed = False
        if w and w[-1] in ("ீ", "ூ"):
            w = w[:-1] + ("ி" if w[-1] == "ீ" else "ு"); changed = True
        elif len(w) >= 2 and w[-1] in S1 and w[-2] != PU and not ("ா" <= w[-2] <= "ௌ") and len(w) > 4:
            # bare consonant (inherent a) directly after another base char
            w = w[:-1]; changed = True
        elif len(w) >= 2 and w[-1] in S1 and ("ா" <= w[-2] <= "ௌ") and len(w) > 4:
            w = w[:-1]; changed = True
        else:
            break
    return w

def longest_of(w, entries):
    best = None
    for e in entries:
        s = e[0]
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = e
    return best

def stem(word):
    w = word
    def ml(): return len(w) > 4

    # question prefixes: [அஇஉஎ] C ் with C a doubling-sandhi consonant
    if len(w) >= 5 and w[0] in "அஇஉஎ" and w[1] in "கசதபவநமயஙஞ" and w[2] == PU:
        w = w[3:]

    w = entry_fix(w)
    if not ml(): return w

    # question suffixes
    for s in ("ோ", "ே", "ா"):
        if w.endswith(s) and ml():
            w = dedup_pu(w[:-1] + PU)
            w = fix(w, FULL, True)
            break

    # tense suffixes (before noun machinery)
    if ml():
        dels = ["கிறான்","கிறாள்","கிறார்கள்","கிறார்","கிறேன்","கிறோம்",
                "கிறீர்கள்","கிறது","கின்றான்","கின்றேன்","கின்றது","கின்றன",
                "ந்தான்","ந்தாள்","ந்தேன்","ந்தது","ந்த",
                "த்தான்","த்தாள்","த்தேன்","த்தது","த்த",
                "னான்","னாள்","வேன்","வான்","வாள்","வார்கள்",
                "ப்பேன்","ப்பான்","து","தான்"]
        pers = ["ேன்","ான்","ாள்","ார்","ோம்"]
        entries = [(s, "", "del") for s in dels] + [(s, PU, "per") for s in pers]
        e = longest_of(w, entries)
        if e is not None:
            s, r, mode = e
            w = dedup_pu(w[:-len(s)] + r)
            if mode == "per":
                w = fix(w, TENSE, False)

    # plural
    if ml():
        if w.endswith("்ங்கள்"):
            w = w[:-5]
        elif w.endswith("ங்கள்"):
            if len(w) >= 8: w = w[:-5] + "ம்"
            else: w = w[:-3]
        elif w.endswith("கள்"):
            w = w[:-3]
            w = fix(w, FULL, True)

    # um / emphatic combinations
    if ml():
        ums = [("ாகியும்", "", None), ("ையும்", "ை", None), ("ாலும்", PU, VET),
               ("ிலும்", PU, VET), ("ோடும்", PU, VET), ("ும்", PU, FULL)]
        e = longest_of(w, ums)
        if e is not None:
            s, r, tab = e
            w = dedup_pu(w[:-len(s)] + r)
            if tab is not None: w = fix(w, tab, True)

    # common word endings
    if ml():
        commons = [("ிலிருந்து", "ில்", None, False),
                   ("ிருந்து", "", None, False),
                   ("ுடன்", PU, FULL, True), ("ிடம்", PU, FULL, True),
                   ("ாகிய", PU, FULL, True), ("ாய", PU, FULL, True),
                   ("ின்றி", PU, FULL, True),
                   ("ாக", PU, WEAK, False), ("ான", PU, WEAK, False),
                   ("ாத", PU, WEAK, False), ("ாது", PU, WEAK, False),
                   ("ாமல்", PU, WEAK, False), ("ாய்", PU, WEAK, False),
                   ("ென", PU, WEAK, False), ("ேயான", PU, WEAK, False),
                   ("வைகள்", "", None, False), ("வை", "", None, False),
                   ("ிய", "ி", None, False), ("ியது", "ி", None, False)]
        e = longest_of(w, commons)
        if e is not None:
            s, r, tab, rep = e
            w = dedup_pu(w[:-len(s)] + r)
            if tab is not None: w = fix(w, tab, rep)

    # vetrumai urupukal
    if ml():
        vets = [("ுக்கு", PU), ("ோடு", PU), ("ால்", PU), ("ில்", PU),
                ("ின்", PU), ("ை", PU), ("ீர்கள்", PU), ("க்கு", "")]
        e = longest_of(w, vets)
        if e is not None:
            s, r = e
            w = dedup_pu(w[:-len(s)] + r)
            if r == PU: w = fix(w, VET, True)
    return w

if __name__ == "__main__":
    tsv = sys.argv[1] if len(sys.argv) > 1 else "/tmp/snow/tamil.tsv"
    bad = []; total = 0
    for line in open(tsv):
        wd, want = line.rstrip("\n").split("\t")
        total += 1
        got = stem(wd)
        if got != want: bad.append((wd, got, want))
    print(f"mismatches: {len(bad)}/{total}")
    for wd, got, want in bad[:36]:
        print(f"  {wd}: got={got} want={want}")
