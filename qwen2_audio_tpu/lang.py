"""Whisper language table: id <-> ISO code <-> full name.

Interoperability data mirroring the reference's g_lang map
(src/qwen2-whisper.cpp:269-370; itself from openai/whisper's tokenizer
LANGUAGES table) and the lookup helpers whisper_lang_id/str/str_full/max_id
(:3330-3373).
"""

from __future__ import annotations

# (code, full name), index = language id
LANGUAGES: list[tuple[str, str]] = [
    ("en", "english"), ("zh", "chinese"), ("de", "german"), ("es", "spanish"),
    ("ru", "russian"), ("ko", "korean"), ("fr", "french"), ("ja", "japanese"),
    ("pt", "portuguese"), ("tr", "turkish"), ("pl", "polish"), ("ca", "catalan"),
    ("nl", "dutch"), ("ar", "arabic"), ("sv", "swedish"), ("it", "italian"),
    ("id", "indonesian"), ("hi", "hindi"), ("fi", "finnish"), ("vi", "vietnamese"),
    ("he", "hebrew"), ("uk", "ukrainian"), ("el", "greek"), ("ms", "malay"),
    ("cs", "czech"), ("ro", "romanian"), ("da", "danish"), ("hu", "hungarian"),
    ("ta", "tamil"), ("no", "norwegian"), ("th", "thai"), ("ur", "urdu"),
    ("hr", "croatian"), ("bg", "bulgarian"), ("lt", "lithuanian"), ("la", "latin"),
    ("mi", "maori"), ("ml", "malayalam"), ("cy", "welsh"), ("sk", "slovak"),
    ("te", "telugu"), ("fa", "persian"), ("lv", "latvian"), ("bn", "bengali"),
    ("sr", "serbian"), ("az", "azerbaijani"), ("sl", "slovenian"), ("kn", "kannada"),
    ("et", "estonian"), ("mk", "macedonian"), ("br", "breton"), ("eu", "basque"),
    ("is", "icelandic"), ("hy", "armenian"), ("ne", "nepali"), ("mn", "mongolian"),
    ("bs", "bosnian"), ("kk", "kazakh"), ("sq", "albanian"), ("sw", "swahili"),
    ("gl", "galician"), ("mr", "marathi"), ("pa", "punjabi"), ("si", "sinhala"),
    ("km", "khmer"), ("sn", "shona"), ("yo", "yoruba"), ("so", "somali"),
    ("af", "afrikaans"), ("oc", "occitan"), ("ka", "georgian"), ("be", "belarusian"),
    ("tg", "tajik"), ("sd", "sindhi"), ("gu", "gujarati"), ("am", "amharic"),
    ("yi", "yiddish"), ("lo", "lao"), ("uz", "uzbek"), ("fo", "faroese"),
    ("ht", "haitian creole"), ("ps", "pashto"), ("tk", "turkmen"), ("nn", "nynorsk"),
    ("mt", "maltese"), ("sa", "sanskrit"), ("lb", "luxembourgish"), ("my", "myanmar"),
    ("bo", "tibetan"), ("tl", "tagalog"), ("mg", "malagasy"), ("as", "assamese"),
    ("tt", "tatar"), ("haw", "hawaiian"), ("ln", "lingala"), ("ha", "hausa"),
    ("ba", "bashkir"), ("jw", "javanese"), ("su", "sundanese"), ("yue", "cantonese"),
]

_CODE_TO_ID = {code: i for i, (code, _) in enumerate(LANGUAGES)}
_NAME_TO_ID = {name: i for i, (_, name) in enumerate(LANGUAGES)}


def lang_max_id() -> int:
    return len(LANGUAGES) - 1


def lang_id(lang: str) -> int:
    """Code or full name -> id; -1 if unknown (whisper_lang_id :3337-3352)."""
    if lang in _CODE_TO_ID:
        return _CODE_TO_ID[lang]
    return _NAME_TO_ID.get(lang.lower(), -1)


def lang_str(lang_id_: int) -> str | None:
    if 0 <= lang_id_ < len(LANGUAGES):
        return LANGUAGES[lang_id_][0]
    return None


def lang_str_full(lang_id_: int) -> str | None:
    if 0 <= lang_id_ < len(LANGUAGES):
        return LANGUAGES[lang_id_][1]
    return None
