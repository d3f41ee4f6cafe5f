import subprocess, sys
lang, infile, outfile = sys.argv[1], sys.argv[2], sys.argv[3]
words = open(infile).read().split()
out = []
B = 500
for i in range(0, len(words), B):
    batch = words[i:i+B]
    sql = "SELECT " + ",".join(
        "ts_lexize('%s_stem', '%s')" % (lang, w.replace("'", "''")) for w in batch)
    r = subprocess.run(["psql","-h","/var/run/postgresql","-U","postgres","-Atc",sql],
                       capture_output=True, text=True)
    vals = r.stdout.strip().split("|")
    assert len(vals) == len(batch), (len(vals), len(batch), r.stderr[:200])
    for w, v in zip(batch, vals):
        stem = v.strip()
        if stem.startswith("{") and stem.endswith("}"):
            stem = stem[1:-1]
        stem = stem.strip('"')
        out.append((w, stem if stem else w))
with open(outfile,"w") as f:
    for w,s in out: f.write(f"{w}\t{s}\n")
print("oracle done:", len(out))
