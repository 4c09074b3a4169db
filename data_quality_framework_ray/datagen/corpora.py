"""Deterministic per-language template corpora.

Used both by the clip-table generator (transcripts) and by
``scripts/train_models.py`` (langid + char-LM training text). Everything is a
pure function of the seed — same seed, same sentences (FIXTURES.md §1).

Languages: en fr de es (allowlist), it (out-of-allowlist natural language),
xx (gibberish). No external data; word lists are hand-written common words.
"""

from __future__ import annotations

import numpy as np

WORDS: dict[str, list[str]] = {
    "en": (
        "the and of to in is that it was for on are with as his they at be this have "
        "from or had by word but not what all were when your can said there use each "
        "which she how their will other about out many then them these some her would "
        "make like him into time has look two more write see number way could people "
        "than first water been call who oil now find long down day did get come made "
        "may part over new sound take only little work know place year live back give "
        "most very after thing our just name good sentence man think say great where "
        "help through much before line right too mean old any same tell boy follow"
    ).split(),
    "fr": (
        "le la les de des un une et est dans que il elle pour sur avec comme son ses "
        "ils elles au aux ce cette avoir être ne pas tout tous mais par mot quand votre "
        "peut dit là chaque qui comment leur sera autre beaucoup alors quelque faire "
        "aime lui temps regarder deux plus écrire voir nombre façon pourrait gens que "
        "premier eau été appeler maintenant trouver long jour obtenir venir fait peut "
        "partie nouveau prendre seulement petit travail savoir lieu année vivre retour "
        "donner très après chose notre juste nom bon phrase homme penser dire grand où "
        "aider travers avant ligne droit aussi vieux même dire garçon suivre venu"
    ).split(),
    "de": (
        "der die das und zu in ist dass es war für auf sind mit als sein sie bei "
        "dieser haben von oder hatte durch wort aber nicht was alle waren wenn ihr "
        "kann sagte dort jeder welche wie ihre wird andere über aus viele dann ihnen "
        "diese würde machen mögen ihn zeit hat schauen zwei mehr schreiben sehen zahl "
        "weg könnte leute als erste wasser gewesen rufen wer öl jetzt finden lang tag "
        "bekommen kommen gemacht teil über neu klingen nehmen nur wenig arbeit wissen "
        "ort jahr leben zurück geben meist sehr nach ding unser gerade name gut satz "
        "mann denken sagen groß wo helfen durch viel vor linie recht auch alt gleich"
    ).split(),
    "es": (
        "el la los las de a en es que se no un una por con para su al lo como más "
        "pero sus le ya o este sí porque esta entre cuando muy sin sobre también me "
        "hasta hay donde quien desde todo nos durante todos uno les ni contra otros "
        "ese eso ante ellos e esto mí antes algunos qué unos yo otro otras otra él "
        "tanto esa estos mucho quienes nada muchos cual poco ella estar estas algunas "
        "algo nosotros tiempo agua primero escribir ver número manera gente llamar "
        "ahora encontrar largo día obtener venir hecho parte nuevo tomar solo pequeño "
        "trabajo saber lugar año vivir dar después cosa nombre bueno hombre pensar"
    ).split(),
    "it": (
        "il lo la i gli le di a da in con su per tra fra è che non una uno sono era "
        "come suo loro questo quella avere essere ma tutto quando vostro può disse "
        "ogni quale come sarà altro molto allora qualche fare tempo guardare due più "
        "scrivere vedere numero modo gente primo acqua chiamare adesso trovare lungo "
        "giorno ottenere venire fatto parte nuovo prendere solo piccolo lavoro sapere "
        "posto anno vivere dare dopo cosa nostro nome buono frase uomo pensare dire "
        "grande dove aiutare attraverso prima linea anche vecchio stesso ragazzo"
    ).split(),
}

GIBBERISH_CHARS = np.array(list("abcdefghijklmnopqrstuvwxyzqxzjkvw"), dtype="U1")

TRAIN_SEED = 1234
TRAIN_SENTENCES_PER_CLASS = 2000


def sentence(lang: str, rng: np.random.Generator, n_words: int | None = None) -> str:
    """One synthetic sentence in ``lang`` (or gibberish for ``xx``)."""
    if lang == "xx":
        return gibberish(rng)
    words = WORDS[lang]
    if n_words is None:
        n_words = int(rng.integers(5, 21))
    idx = rng.integers(0, len(words), size=n_words)
    return " ".join(words[i] for i in idx)


def gibberish(rng: np.random.Generator, n_chars: int | None = None) -> str:
    """Uniform random letter soup with occasional spaces — high char-LM perplexity."""
    if n_chars is None:
        n_chars = int(rng.integers(20, 120))
    chars = GIBBERISH_CHARS[rng.integers(0, len(GIBBERISH_CHARS), size=n_chars)]
    out = list("".join(chars))
    for pos in range(7, n_chars, 8):
        out[pos] = " "
    return "".join(out)


def training_corpus() -> dict[str, list[str]]:
    """Deterministic training text per langid class (SPEC.md 'Language ID')."""
    out: dict[str, list[str]] = {}
    for ci, lang in enumerate(("en", "fr", "de", "es", "it", "xx")):
        rng = np.random.default_rng(TRAIN_SEED + ci)
        out[lang] = [sentence(lang, rng) for _ in range(TRAIN_SENTENCES_PER_CLASS)]
    return out
