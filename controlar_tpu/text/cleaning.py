"""Caption cleaning with the reference's exact contract.

The t2i pipeline cleans captions twice before tokenization (ref
language/t5.py:80-87, clean_caption t5.py:95-201 — itself the public
PixArt/DeepFloyd-IF recipe). This is metric-relevant: FID/CLIP comparisons
assume identical prompts. Behavior is reproduced as an ordered rule table.

ftfy is not in this image; `basic_clean` falls back to html-unescape only and
records the deviation (ftfy mojibake repair rarely triggers on ASCII
captions). Install ftfy for bit-exact parity on non-ASCII captions.
"""
from __future__ import annotations

import html
import re
import urllib.parse as ul

try:  # optional: mojibake repair
    import ftfy

    _HAS_FTFY = True
except ImportError:
    _HAS_FTFY = False

from bs4 import BeautifulSoup

# ref t5.py:29-33 (bad_punct_regex)
BAD_PUNCT = re.compile(
    r"["
    + "#®•©™&@·º½¾¿¡§~"
    + r"\)"
    + r"\("
    + r"\]"
    + r"\["
    + r"\}"
    + r"\{"
    + r"\|"
    + "\\\\"
    + r"\/"
    + r"\*"
    + r"]{1,}"
)

_DASHES = (
    r"[\u002D\u058A\u05BE\u1400\u1806\u2010-\u2015\u2E17\u2E1A\u2E3A\u2E3B"
    r"\u2E40\u301C\u3030\u30A0\uFE31\uFE32\uFE58\uFE63\uFF0D]+"
)
_URL1 = (
    r"\b((?:https?:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.]"
    r"(?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))"
)
_URL2 = (
    r"\b((?:www:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.]"
    r"(?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))"
)


def basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def clean_caption(caption: str) -> str:
    """One cleaning pass (ref t5.py:95-201). Apply twice via text_preprocess."""
    c = str(caption)
    c = ul.unquote_plus(c)
    c = c.strip().lower()
    c = re.sub("<person>", "person", c)
    c = re.sub(_URL1, "", c)
    c = re.sub(_URL2, "", c)
    c = BeautifulSoup(c, features="html.parser").text
    c = re.sub(r"@[\w\d]+\b", "", c)
    # CJK blocks
    for rng in (
        r"[\u31c0-\u31ef]+", r"[\u31f0-\u31ff]+", r"[\u3200-\u32ff]+",
        r"[\u3300-\u33ff]+", r"[\u3400-\u4dbf]+", r"[\u4dc0-\u4dff]+",
        r"[\u4e00-\u9fff]+",
    ):
        c = re.sub(rng, "", c)
    c = re.sub(_DASHES, "-", c)
    c = re.sub(r"[`´«»“”¨]", '"', c)
    c = re.sub(r"[‘’]", "'", c)
    c = re.sub(r"&quot;?", "", c)
    c = re.sub(r"&amp", "", c)
    c = re.sub(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", " ", c)  # IPs
    c = re.sub(r"\d:\d\d\s+$", "", c)  # article ids
    c = re.sub(r"\\n", " ", c)
    c = re.sub(r"#\d{1,3}\b", "", c)
    c = re.sub(r"#\d{5,}\b", "", c)
    c = re.sub(r"\b\d{6,}\b", "", c)
    c = re.sub(r"[\S]+\.(?:png|jpg|jpeg|bmp|webp|eps|pdf|apk|mp4)", "", c)
    c = re.sub(r"[\"\']{2,}", r'"', c)
    c = re.sub(r"[\.]{2,}", r" ", c)
    c = re.sub(BAD_PUNCT, r" ", c)
    c = re.sub(r"\s+\.\s+", r" ", c)
    regex2 = re.compile(r"(?:\-|\_)")
    if len(re.findall(regex2, c)) > 3:
        c = re.sub(regex2, " ", c)
    c = basic_clean(c)
    c = re.sub(r"\b[a-zA-Z]{1,3}\d{3,15}\b", "", c)
    c = re.sub(r"\b[a-zA-Z]+\d+[a-zA-Z]+\b", "", c)
    c = re.sub(r"\b\d+[a-zA-Z]+\d+\b", "", c)
    c = re.sub(r"(worldwide\s+)?(free\s+)?shipping", "", c)
    c = re.sub(r"(free\s)?download(\sfree)?", "", c)
    c = re.sub(r"\bclick\b\s(?:for|on)\s\w+", "", c)
    c = re.sub(r"\b(?:png|jpg|jpeg|bmp|webp|eps|pdf|apk|mp4)(\simage[s]?)?", "", c)
    c = re.sub(r"\bpage\s+\d+\b", "", c)
    c = re.sub(r"\b\d*[a-zA-Z]+\d+[a-zA-Z]+\d+[a-zA-Z\d]*\b", r" ", c)
    c = re.sub(r"\b\d+\.?\d*[xх×]\d+\.?\d*\b", "", c)
    c = re.sub(r"\b\s+\:\s+", r": ", c)
    c = re.sub(r"(\D[,\./])\b", r"\1 ", c)
    c = re.sub(r"\s+", " ", c)
    c.strip()  # no-op, preserved from the reference for fidelity
    c = re.sub(r'^[\"\']([\w\W]+)[\"\']$', r"\1", c)
    c = re.sub(r"^[\'\_,\-\:;]", r"", c)
    c = re.sub(r"[\'\_,\-\:\-\+]$", r"", c)
    c = re.sub(r"^\.\S+$", "", c)
    return c.strip()


def text_preprocess(text: str, use_cleaning: bool = True) -> str:
    """(ref t5.py:80-87: clean twice; else lower/strip.)"""
    if use_cleaning:
        return clean_caption(clean_caption(text))
    return text.lower().strip()
