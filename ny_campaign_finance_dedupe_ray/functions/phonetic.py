"""Double Metaphone phonetic encoding (Lawrence Philips' public algorithm,
C/C++ reference published in Dr. Dobb's Journal, June 2000).

Fresh Python implementation of the published rule set; used by the
``doubleMetaphone`` / ``metaphoneToken`` blocking predicates (reference
behavior at /root/reference/dedupe_extension/dedupe/dedupe/predicates.py:476-484,
expected outputs in tests/test_predicates.py:19-22).  Returns
``(primary, secondary)``; secondary is '' when identical to primary.
"""

from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _is_vowel(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in VOWELS


def _slavo_germanic(s: str) -> bool:
    return any(x in s for x in ("W", "K", "CZ", "WITZ"))


def doublemetaphone(word: str) -> tuple[str, str]:  # noqa: C901
    s = "".join(c for c in word.upper() if "A" <= c <= "Z" or c in "ÇÑ")
    s = s.replace("Ç", "S").replace("Ñ", "N")
    if not s:
        return ("", "")
    length = len(s)
    last = length - 1
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, q: str | None = None) -> None:
        pri.append(p)
        sec.append(p if q is None else q)

    i = 0
    # skip silent initial letters
    if s[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    if s[0] == "X":  # initial X -> S
        add("S")
        i = 1

    while i < length and (len(pri) < 4 or len(sec) < 4):
        c = s[i]
        if c in VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue
        if c == "B":
            add("P")
            i += 2 if s[i: i + 2] == "BB" else 1
            continue
        if c == "C":
            # various Germanic CH etc.
            if (
                i > 1
                and not _is_vowel(s, i - 2)
                and s[i - 1: i + 2] == "ACH"
                and (s[i + 2: i + 3] != "I" and (s[i + 2: i + 3] != "E" or s[i - 2: i + 4] in ("BACHER", "MACHER")))
            ):
                add("K")
                i += 2
                continue
            if i == 0 and s[:6] == "CAESAR":
                add("S")
                i += 2
                continue
            if s[i: i + 4] == "CHIA":
                add("K")
                i += 2
                continue
            if s[i: i + 2] == "CH":
                if i > 0 and s[i: i + 4] == "CHAE":
                    add("K", "X")
                    i += 2
                    continue
                if i == 0 and (
                    s[i + 1: i + 6] in ("HARAC", "HARIS")
                    or s[i + 1: i + 4] in ("HOR", "HYM", "HIA", "HEM")
                ) and s[:5] != "CHORE":
                    add("K")
                    i += 2
                    continue
                if (
                    s[:4] in ("VAN ", "VON ")
                    or s[:3] == "SCH"
                    or s[i - 2: i + 4] in ("ORCHES", "ARCHIT", "ORCHID")
                    or s[i + 2: i + 3] in ("T", "S")
                    or (
                        (s[i - 1: i] in ("A", "O", "U", "E") or i == 0)
                        and s[i + 2: i + 3] in ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ", "")
                    )
                ):
                    add("K")
                else:
                    if i > 0:
                        if s[:2] == "MC":
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            if s[i: i + 2] == "CZ" and s[i - 2: i + 2] != "WICZ":
                add("S", "X")
                i += 2
                continue
            if s[i + 1: i + 4] == "CIA":
                add("X")
                i += 3
                continue
            if s[i: i + 2] == "CC" and not (i == 1 and s[0] == "M"):
                if s[i + 2: i + 3] in ("I", "E", "H") and s[i + 2: i + 4] != "HU":
                    if (i == 1 and s[i - 1] == "A") or s[i - 1: i + 4] in ("UCCEE", "UCCES"):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                    continue
                add("K")
                i += 2
                continue
            if s[i: i + 2] in ("CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if s[i: i + 2] in ("CI", "CE", "CY"):
                if s[i: i + 3] in ("CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if s[i + 1: i + 3] in (" C", " Q", " G"):
                i += 3
            elif s[i + 1: i + 2] in ("C", "K", "Q") and s[i + 1: i + 3] not in ("CE", "CI"):
                i += 2
            else:
                i += 1
            continue
        if c == "D":
            if s[i: i + 2] == "DG":
                if s[i + 2: i + 3] in ("I", "E", "Y"):
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
                continue
            add("T")
            i += 2 if s[i: i + 2] in ("DT", "DD") else 1
            continue
        if c == "F":
            add("F")
            i += 2 if s[i + 1: i + 2] == "F" else 1
            continue
        if c == "G":
            if s[i + 1: i + 2] == "H":
                if i > 0 and not _is_vowel(s, i - 1):
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    if s[i + 2: i + 3] == "I":
                        add("J")
                    else:
                        add("K")
                    i += 2
                    continue
                if (
                    (i > 1 and s[i - 2] in ("B", "H", "D"))
                    or (i > 2 and s[i - 3] in ("B", "H", "D"))
                    or (i > 3 and s[i - 4] in ("B", "H"))
                ):
                    i += 2
                    continue
                if i > 2 and s[i - 1] == "U" and s[i - 3] in ("C", "G", "L", "R", "T"):
                    add("F")
                elif i > 0 and s[i - 1] != "I":
                    add("K")
                i += 2
                continue
            if s[i + 1: i + 2] == "N":
                if i == 1 and _is_vowel(s, 0) and not _slavo_germanic(s):
                    add("KN", "N")
                elif s[i + 2: i + 4] != "EY" and s[i + 1: i + 2] != "Y" and not _slavo_germanic(s):
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if s[i + 1: i + 3] == "LI" and not _slavo_germanic(s):
                add("KL", "L")
                i += 2
                continue
            if i == 0 and (s[i + 1: i + 2] == "Y" or s[i + 1: i + 3] in (
                "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER"
            )):
                add("K", "J")
                i += 2
                continue
            if (s[i + 1: i + 3] == "ER" or s[i + 1: i + 2] == "Y") and s[:6] not in (
                "DANGER", "RANGER", "MANGER"
            ) and s[i - 1: i] not in ("E", "I") and s[i - 1: i + 2] not in ("RGY", "OGY"):
                add("K", "J")
                i += 2
                continue
            if s[i + 1: i + 2] in ("E", "I", "Y") or s[i - 1: i + 3] in ("AGGI", "OGGI"):
                if s[:4] in ("VAN ", "VON ") or s[:3] == "SCH" or s[i + 1: i + 3] == "ET":
                    add("K")
                elif s[i + 1: i + 5] == "IER ":
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if s[i + 1: i + 2] == "G" else 1
            continue
        if c == "H":
            if (i == 0 or _is_vowel(s, i - 1)) and _is_vowel(s, i + 1):
                add("H")
                i += 2
            else:
                i += 1
            continue
        if c == "J":
            if s[i: i + 4] == "JOSE" or s[:4] == "SAN ":
                if (i == 0 and s[i + 4: i + 5] == " ") or s[:4] == "SAN ":
                    add("H")
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0 and s[i: i + 4] != "JOSE":
                add("J", "A")
            elif _is_vowel(s, i - 1) and not _slavo_germanic(s) and s[i + 1: i + 2] in ("A", "O"):
                add("J", "H")
            elif i == last:
                add("J", "")
            elif s[i + 1: i + 2] not in ("L", "T", "K", "S", "N", "M", "B", "Z") and s[i - 1: i] not in ("S", "K", "L"):
                add("J")
            i += 2 if s[i + 1: i + 2] == "J" else 1
            continue
        if c == "K":
            add("K")
            i += 2 if s[i + 1: i + 2] == "K" else 1
            continue
        if c == "L":
            if s[i + 1: i + 2] == "L":
                # spanish 'LL'
                if (
                    i == length - 3 and s[i - 1: i + 3] in ("ILLO", "ILLA", "ALLE")
                ) or (
                    (s[last - 1: last + 1] in ("AS", "OS") or s[last] in ("A", "O"))
                    and s[i - 1: i + 3] == "ALLE"
                ):
                    add("L", "")
                    i += 2
                    continue
                add("L")
                i += 2
            else:
                add("L")
                i += 1
            continue
        if c == "M":
            add("M")
            if s[i - 1: i + 2] == "UMB" and (i + 1 == last or s[i + 2: i + 4] == "ER") or s[i + 1: i + 2] == "M":
                i += 2
            else:
                i += 1
            continue
        if c == "N":
            add("N")
            i += 2 if s[i + 1: i + 2] == "N" else 1
            continue
        if c == "P":
            if s[i + 1: i + 2] == "H":
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if s[i + 1: i + 2] in ("P", "B") else 1
            continue
        if c == "Q":
            add("K")
            i += 2 if s[i + 1: i + 2] == "Q" else 1
            continue
        if c == "R":
            if (
                i == last
                and not _slavo_germanic(s)
                and s[i - 2: i] == "IE"
                and s[i - 4: i - 2] not in ("ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            i += 2 if s[i + 1: i + 2] == "R" else 1
            continue
        if c == "S":
            if s[i - 1: i + 2] in ("ISL", "YSL"):
                i += 1
                continue
            if i == 0 and s[:5] == "SUGAR":
                add("X", "S")
                i += 1
                continue
            if s[i: i + 2] == "SH":
                if s[i + 1: i + 5] in ("HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                i += 2
                continue
            if s[i: i + 3] in ("SIO", "SIA") or s[i: i + 4] == "SIAN":
                if _slavo_germanic(s):
                    add("S")
                else:
                    add("S", "X")
                i += 3
                continue
            if (i == 0 and s[i + 1: i + 2] in ("M", "N", "L", "W")) or s[i + 1: i + 2] == "Z":
                add("S", "X")
                i += 2 if s[i + 1: i + 2] == "Z" else 1
                continue
            if s[i: i + 2] == "SC":
                if s[i + 2: i + 3] == "H":
                    if s[i + 3: i + 5] in ("OO", "ER", "EN", "UY", "ED", "EM"):
                        if s[i + 3: i + 5] in ("ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and not _is_vowel(s, 3) and s[3] != "W":
                            add("X", "S")
                        else:
                            add("X")
                    i += 3
                    continue
                if s[i + 2: i + 3] in ("I", "E", "Y"):
                    add("S")
                    i += 3
                    continue
                add("SK")
                i += 3
                continue
            if i == last and s[i - 2: i] in ("AI", "OI"):
                add("", "S")
            else:
                add("S")
            i += 2 if s[i + 1: i + 2] in ("S", "Z") else 1
            continue
        if c == "T":
            if s[i: i + 4] == "TION":
                add("X")
                i += 3
                continue
            if s[i: i + 3] in ("TIA", "TCH"):
                add("X")
                i += 3
                continue
            if s[i: i + 2] == "TH" or s[i: i + 3] == "TTH":
                if s[i + 2: i + 4] in ("OM", "AM") or s[:4] in ("VAN ", "VON ") or s[:3] == "SCH":
                    add("T")
                else:
                    add("0", "T")
                i += 2
                continue
            add("T")
            i += 2 if s[i + 1: i + 2] in ("T", "D") else 1
            continue
        if c == "V":
            add("F")
            i += 2 if s[i + 1: i + 2] == "V" else 1
            continue
        if c == "W":
            if s[i: i + 2] == "WR":
                add("R")
                i += 2
                continue
            if i == 0 and (_is_vowel(s, i + 1) or s[i: i + 2] == "WH"):
                if _is_vowel(s, i + 1):
                    add("A", "F")
                else:
                    add("A")
            if (i == last and _is_vowel(s, i - 1)) or s[i - 1: i + 4] in (
                "EWSKI", "EWSKY", "OWSKI", "OWSKY"
            ) or s[:3] == "SCH":
                add("", "F")
                i += 1
                continue
            if s[i: i + 4] in ("WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
                continue
            i += 1
            continue
        if c == "X":
            if not (i == last and (s[i - 3: i] in ("IAU", "EAU") or s[i - 2: i] in ("AU", "OU"))):
                add("KS")
            i += 2 if s[i + 1: i + 2] in ("C", "X") else 1
            continue
        if c == "Z":
            if s[i + 1: i + 2] == "H":
                add("J")
                i += 2
                continue
            if s[i + 1: i + 3] in ("ZO", "ZI", "ZA") or (_slavo_germanic(s) and i > 0 and s[i - 1] != "T"):
                add("S", "TS")
            else:
                add("S")
            i += 2 if s[i + 1: i + 2] == "Z" else 1
            continue
        i += 1

    primary = "".join(pri)[:4]
    secondary = "".join(sec)[:4]
    if secondary == primary:
        secondary = ""
    return (primary, secondary)
