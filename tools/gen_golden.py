#!/usr/bin/env python3
"""Dev-time golden-fixture generator (stdlib only; run once, output committed).

Re-executes the REFERENCE semantics (jhlopesalves/CorpusAid
src/CorpusAid.py:192-444 — each PreprocessingModule is a short chain of
re/unicodedata stdlib calls, quoted here as the spec) over a fixture battery,
emitting src/test/resources/golden/kernel_golden.json. The ScalaTest suite
asserts our JVM kernels are byte-identical, which is the Python→Java regex /
Unicode parity evidence called out in SURVEY.md §7.4.

spaCy/BeautifulSoup-backed modules (T12/T13/T14) are excluded: the engine
defines its own deterministic spec for those (SURVEY.md §7.4 items 3-4) and
they are covered by hand-written fixtures in the Scala tests.
"""
import json
import re
import unicodedata

# --- module semantics, quoted from the reference (file:line cited) ---

def t1_character_filter(chars_to_remove):
    # src/CorpusAid.py:197-225
    escaped = [re.escape(s) for s in chars_to_remove]
    pats = [f"\\b{s}\\b" if re.match(r"^\w+$", s) else s for s in escaped]
    pat = re.compile("|".join(pats), re.IGNORECASE)
    return lambda t: pat.sub("", t)

def t2_normalize_line_breaks(t):
    # src/CorpusAid.py:228-242
    single = re.compile(r"\s*\w\s*")
    soft = re.compile(r"(?<!\.\s)\n(?!\s*\n)", re.MULTILINE)
    lines = t.splitlines()
    t = "\n".join(l for l in lines if not single.fullmatch(l))
    t = soft.sub(" ", t)
    t = re.sub(r"\s{2,}", " ", t)
    return t.strip()

def t3_page_numbers(t):
    return re.sub(r"^\s*\d{1,4}\s*$", "", t, flags=re.MULTILINE)

def t4_roman(t):
    return re.sub(r"^\s*[IiVvXxLlCcDdMm]{1,7}\s*$", "", t, flags=re.MULTILINE)

def t5_page_indicator(t):
    return re.sub(r"\b(?:[Pp]age|[Pp]ag\.?)\s+(\d+|[IVXLCDM]+)\b", "", t, flags=re.MULTILINE)

def t6_page_delimiter(t):
    return re.sub(r"---\s*Page\s+\d+\s*---", "", t, flags=re.MULTILINE)

def t7_normalize_spacing(t):
    # src/CorpusAid.py:285-306 — nine subs in order
    t = re.sub(r"\s+([.,?!;:])", r"\1", t)
    t = re.sub(r"([.,?!;:])(\S)", r"\1 \2", t)
    t = re.sub(r"\(\s+", "(", t)
    t = re.sub(r"\s+\)", ")", t)
    t = re.sub(r"\[\s+", "[", t)
    t = re.sub(r"\s+\]", "]", t)
    t = re.sub(r"\{\s+", "{", t)
    t = re.sub(r"\s+\}", "}", t)
    t = re.sub(r"\s{2,}", " ", t)
    return t.strip()

def t8_remove_break_lines(t):
    return t.replace("\n", " ")

def t9_bib_refs(t):
    return re.sub(r"\([A-Z][a-z]+(?:[^()]*?\d{4}[^()]*?)?\)", "", t)

def t10_lowercase(t):
    return t.lower()

def t11_user_regex(pattern):
    pat = re.compile(pattern, re.DOTALL)
    return lambda t: pat.sub("", t)

def t15_diacritics(t):
    return "".join(c for c in unicodedata.normalize("NFD", t)
                   if unicodedata.category(c) != "Mn")

def t16_greek(t):
    return "".join(c for c in t if not unicodedata.name(c, "").startswith("GREEK"))

def t17_cyrillic(t):
    return "".join(c for c in t if not unicodedata.name(c, "").startswith("CYRILLIC"))

def t18_nfkc(t):
    return unicodedata.normalize("NFKC", t)

def t19_super_sub(t):
    return "".join(c for c in t if unicodedata.category(c) not in {"No", "Sk"})

def wc_split(t):
    return len(t.split())


# --- fixture battery ---

GENERAL = [
    "",
    "   ",
    "plain ascii text, nothing special.",
    "Hello,World ! How are  you ?",
    "line one\nline two\n\nparagraph two. \nnew sentence",
    "a\nb\ncd\nthe end\n x \n1\n",
    " 42 \n1234\n12345\ntext 42 inline\n9\n",
    "xiv\n IX \nI\ndid\nmix\nixviiixx\nMCMXCIV\ncontent here\n",
    "see Page 12 for details, pag. XIV, Pag 3, rampage 3, page 7x",
    "--- Page 123 ---\ntext\n---Page 7---",
    "as shown (Smith 2020) and (Smith, some title 1994 ed.) but (see below) and (SMITH 2020)",
    "ÀÉÎ Straße İ DON'T Shout",
    "João é über naïve; o coração dói",
    "αβγ Ω mixed ελληνικά with latin",
    "Привет мир and Latin text",
    "ﬁne Ａ ① ｶﾀｶﾅ ½",
    "x² H₂O ˚ plain 2 digits ¾",
    "word , word ( spaced ) [ x ] { y }   many\tspaces.Next",
    "Tabs\tand nbsp\u00a0emsp\u2003ends\u2003 ",
    "Ends with period. \nNext line\nsoft wrap\n\nblank sep",
    "ΣΊΣΥΦΟΣ σίσυφος Σ",
    "café CAFÉ Café",
    "〈fullwidth：；〉ﬂags ﬀ",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝟙𝟚𝟛 math",
    "e.g. foo bar FOO $5.00 foo.bar food",
    "multi  spaces   and\n\nnewlines\n",
    "trailing ws   \t",
    " unicode line\u2028sep para\u2029sep\u0085nel",
    "No4 · × ÷ № ℮ µ",
    "(Brown 1999) (brown 1999) (B 2000) (Browne)",
]

def fuzz_strings(n=200, seed=1234):
    """Seeded fuzz: random compositions of text atoms incl. unicode edge
    material, newlines, page artifacts — broadens the parity battery."""
    import random
    rng = random.Random(seed)
    atoms = ["word", "Foo", "42", "1234", "xiv", "I", " ", "  ", "\t", "\n",
             "\n\n", ". ", ",", "(Smith 2020)", "--- Page 7 ---", "Page 12",
             "pag. IX", "é", "ü", "ß", "αβ", "Ж", "²", "₃", "ﬁ", "Ａ", "½",
             "İ", "Σ", "ΟΣ ", "don't", "a", "e.g.", "$", "#", "x" * 30,
             " ", " ", "…", "<b>", "</b>", "&amp;", ":", ";", "?"]
    out = []
    for _ in range(n):
        k = rng.randint(0, 20)
        out.append("".join(rng.choice(atoms) for _ in range(k)))
    return out


def cases():
    out = []
    def add(op, inp, exp, note=""):
        out.append({"op": op, "input": inp, "expected": exp, "note": note})

    simple_ops = {
        "normalize_line_breaks": t2_normalize_line_breaks,
        "remove_page_numbers": t3_page_numbers,
        "remove_roman_page_numbers": t4_roman,
        "remove_page_indicators": t5_page_indicator,
        "remove_page_delimiters": t6_page_delimiter,
        "normalize_spacing": t7_normalize_spacing,
        "remove_break_lines": t8_remove_break_lines,
        "remove_bibliographical_references": t9_bib_refs,
        "lowercase": t10_lowercase,
        "remove_diacritics": t15_diacritics,
        "remove_greek": t16_greek,
        "remove_cyrillic": t17_cyrillic,
        "normalize_unicode": t18_nfkc,
        "remove_super_sub_script": t19_super_sub,
    }
    for op, fn in simple_ops.items():
        for inp in GENERAL:
            add(op, inp, fn(inp))

    # T1 with the FIXTURES.md §3 parameter set
    for params in (["foo", "e.g.", "$"], ["don", "é", "x2"], ["word"]):
        fn = t1_character_filter(params)
        key = "character_filter|" + "".join(params)
        for inp in GENERAL:
            add(key, inp, fn(inp))

    # T11 user regexes (DOTALL)
    for pat in (r"http.*?\s", r"\d{4}", r"<.*?>", r"foo.bar"):
        fn = t11_user_regex(pat)
        key = "regex_substitution|" + pat
        for inp in GENERAL + ["see http://x.y/z next\nand http://a.b end",
                              "<a\nhref=x>multi\nline</a>"]:
            add(key, inp, fn(inp))

    # word count mode A
    for inp in GENERAL:
        add("split_word_count", inp, str(wc_split(inp)))

    # python strip parity
    for inp in GENERAL + ["\x85nel ends\x85", " nbsp ", "\x1c\x1dfs"]:
        add("py_strip", inp, inp.strip())

    # full chains of python-exact stages (pipeline fold + final strip,
    # src/CorpusAid.py:432-444,689-694)
    chain_ops = [t18_nfkc, t15_diacritics, t7_normalize_spacing,
                 t2_normalize_line_breaks, t8_remove_break_lines,
                 t3_page_numbers, t4_roman, t5_page_indicator,
                 t6_page_delimiter, t9_bib_refs, t10_lowercase,
                 t16_greek, t17_cyrillic, t19_super_sub]
    for inp in GENERAL:
        t = inp
        for fn in chain_ops:
            t = fn(t)
        add("full_chain_python_exact", inp, t.strip())

    # fuzz battery: every simple op + the full chain over 200 seeded strings
    fuzz = fuzz_strings()
    for op, fn in simple_ops.items():
        for inp in fuzz:
            add(op, inp, fn(inp))
    for inp in fuzz:
        t = inp
        for fn in chain_ops:
            t = fn(t)
        add("full_chain_python_exact", inp, t.strip())
        add("py_strip", inp, inp.strip())
        add("split_word_count", inp, str(wc_split(inp)))

    return out

if __name__ == "__main__":
    import os
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src/test/resources/golden/kernel_golden.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(cases(), f, ensure_ascii=True, indent=0)
    print(f"wrote {dest}: {len(cases())} cases")
