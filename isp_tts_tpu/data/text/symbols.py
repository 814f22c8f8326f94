"""Symbol inventories for charset macros.

Parity: reference `tts/data/text/symbols.py:1-12` — these are alphabet data
constants (shared by construction, not by code).
"""

PAD = "<pad>"
EOS = "</s>"

PUNCTUATION = ".!?():;,—- '\""
MARKS = "+*\\"

RUSSIAN = "абвгдеёжзийклмнопрстуфхцчшщъыьэюя"
ENGLISH = "abcdefghijklmnopqrstuvwxyz"

IPA_PHONEMES = (
    "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ̃'"
)

CHARSET_MAP = {
    "#punct": PUNCTUATION,
    "#marks": MARKS,
    "#ru": RUSSIAN,
    "#en": ENGLISH,
    "#ipa_ph": IPA_PHONEMES,
}
