import random, subprocess
random.seed(42)
V = "aeıioöuü"
C = "bcçdfgğhjklmnprsştvyz"
stems = set()
# random stems: CV patterns of varying length (region/harmony stress)
for _ in range(900):
    n = random.randint(2, 6)
    w = ""
    for i in range(n):
        w += random.choice(C) if i % 2 == random.randint(0,1) else random.choice(V)
    stems.add(w)
# realistic-ish stems: CVC(VC) with harmony-consistent vowels
back, front = "aıou", "eiöü"
for _ in range(600):
    grp = random.choice([back, front])
    n = random.randint(1, 3)
    w = random.choice(C)
    for i in range(n):
        w += random.choice(grp) + random.choice(C)
    stems.add(w)
stems = sorted(stems)
suffixes = []
# noun: plural, possessive, case, copula chains (all harmony variants)
for s in ["lar","ler","ı","i","u","ü","yı","yi","yu","yü","nı","ni","nu","nü",
          "sı","si","su","sü","ları","leri","a","e","ya","ye","na","ne",
          "da","de","ta","te","nda","nde","dan","den","tan","ten","ndan","nden",
          "la","le","yla","yle","ki","nın","nin","nun","nün","ın","in","un","ün",
          "ım","im","um","üm","ımız","imiz","umuz","ümüz","ınız","iniz","unuz","ünüz",
          "m","n","k","dır","dir","dur","dür","tır","tir","tur","tür",
          "dı","di","du","dü","tı","ti","tu","tü","ydı","ydi","ydu","ydü",
          "sa","se","ysa","yse","mış","miş","muş","müş","ymış","ymiş",
          "casına","cesine","ken","yken","sın","sin","sun","sün",
          "ız","iz","uz","üz","yız","yiz","yuz","yüz","sınız","siniz","sunuz","sünüz",
          "nız","niz","nuz","nüz"]:
    suffixes.append(s)
# chained combos
chains = ["lardan","lerden","larım","lerim","larımız","lerimiz","ların","lerin",
          "larında","lerinde","sında","sinde","larından","lerinden","ındaki","indeki",
          "undaki","ündeki","daki","deki","taki","teki","dakiler","dekiler",
          "kiler","kine","kini","ndaki","sındaki","lardı","lerdi","lardır","lerdir",
          "mıştı","mişti","acak","ecek","ıyor","iyor","uyor","üyor","yorum","yorsun",
          "larıyla","leriyle","sıyla","siyle","ydık","ydik","mışız","mişiz",
          "sınızdır","sinizdir","larsa","lerse","mışcasına","mişcesine"]
words = set()
for st in stems:
    words.add(st)
for i, st in enumerate(stems):
    for j in range(3):
        words.add(st + random.choice(suffixes))
    if i % 2 == 0:
        words.add(st + random.choice(chains))
# real Turkish words incl. reserved + d/g endings
words |= set("""kitap kitaplar kitaplarımızdan ev evler evlerinde geliyorum ad adınız soyadım soyadınız
araba arabalar arabam arabasında gözlerinizin çocuklarımızın öğretmenlerimizden istanbul ankara
gidecek gelecek yapacak olacak vardır yoktur güzeldir büyüktür kedi kediler köpek köpeğim ağaç ağacı
su suyu dağ dağlar renk rengi kalp kalbi kitabı kitapçı kitapçılık arkadaşlarımla türkçe türk
gelmişti gitmişti okuyorum yazıyorsun biliyoruz seviyorlar anlamadım görmedim duymadınız
ayakkabı ayakkabılarımı pencereden kapıdan yoldaki evdekiler şehirdekilerden adlarımız soyadları""".split())
words = sorted(w for w in words if w)
print(len(words))
with open("/tmp/snow/turkish_words.txt","w") as f:
    f.write("\n".join(words))
