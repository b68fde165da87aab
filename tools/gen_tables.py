#!/usr/bin/env python3
"""One-off extractor: converts the standard Adobe encoding/width/glyph data
(as carried in the reference's converter_data.cc / standard_widths.h /
symbol_table.h -- all public Adobe spec data: StandardEncoding, MacRoman,
MacExpert, WinAnsi, AFM widths for the standard-14 fonts, and the Adobe
Glyph List) into TSV resources for the Scala engine."""
import re, sys, os

REF = "/root/reference"
OUT = "/root/repo/src/main/resources/graft/pdf"

def cxx_str(s):
    # decode a C++ string literal body (already between quotes)
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == '\\':
            i += 1
            e = s[i]
            m = {'n':'\n','r':'\r','t':'\t','b':'\b','f':'\f','\\':'\\','"':'"',"'":"'",'0':'\0'}
            if e == 'x':
                j = i+1
                h = ''
                while j < len(s) and s[j] in '0123456789abcdefABCDEF' and len(h)<2:
                    h += s[j]; j += 1
                out.append(chr(int(h,16))); i = j; continue
            out.append(m[e]); i += 1
        else:
            out.append(c); i += 1
    return ''.join(out)

def parse_encoding(src, name):
    # extract body of: const unordered_map<unsigned int, string> NAME = { ... };
    m = re.search(re.escape(name) + r'\s*=\s*\{(.*?)\};', src, re.S)
    body = m.group(1)
    pairs = re.findall(r'\{\s*(\d+)\s*,\s*"((?:[^"\\]|\\.)*)"\s*,?\s*\}', body)
    return [(int(k), cxx_str(v)) for k, v in pairs]

def esc_tsv(s):
    return s.replace('\\','\\\\').replace('\t','\\t').replace('\n','\\n').replace('\r','\\r')

src = open(f"{REF}/converter_data.cc", encoding='utf-8').read()
for cxx, fn in [("standard_encoding","enc_standard.tsv"),
                ("mac_roman_encoding","enc_macroman.tsv"),
                ("mac_expert_encoding","enc_macexpert.tsv"),
                ("win_ansi_encoding","enc_winansi.tsv")]:
    rows = parse_encoding(src, cxx)
    with open(f"{OUT}/{fn}", 'w', encoding='utf-8') as f:
        for k, v in rows:
            f.write(f"{k}\t{esc_tsv(v)}\n")
    print(fn, len(rows))

# encoding2charset: {"name", "charset"} or nullptr
m = re.search(r'encoding2charset\s*=\s*\{(.*?)\};', src, re.S)
pairs = re.findall(r'\{\s*"((?:[^"\\]|\\.)*)"\s*,\s*(nullptr|"(?:[^"\\]|\\.)*")\s*\}', m.group(1))
with open(f"{OUT}/cid_charsets.tsv", 'w') as f:
    for k, v in pairs:
        cs = '' if v == 'nullptr' else cxx_str(v[1:-1])
        f.write(f"{cxx_str(k)}\t{cs}\n")
print("cid_charsets.tsv", len(pairs))

# symbol_table.h: {"/name", "utf8"},
src = open(f"{REF}/symbol_table.h", encoding='utf-8').read()
pairs = re.findall(r'\{\s*"((?:[^"\\]|\\.)*)"\s*,\s*"((?:[^"\\]|\\.)*)"\s*\}', src)
with open(f"{OUT}/glyphlist.tsv", 'w', encoding='utf-8') as f:
    for k, v in pairs:
        f.write(f"{esc_tsv(cxx_str(k))}\t{esc_tsv(cxx_str(v))}\n")
print("glyphlist.tsv", len(pairs))

# standard_widths.h: {"/Font", {{'c', w},...}}  chars may be 'x', '\xNN', '\t', or 0xNN
src = open(f"{REF}/standard_widths.h", encoding='utf-8').read()
fonts = re.findall(r'\{\s*"(/[A-Za-z\-]+)"\s*,\s*\{(.*?)\}\s*\}\s*[,}]', src, re.S)
with open(f"{OUT}/std_widths.tsv", 'w') as f:
    n = 0
    for name, body in fonts:
        entries = re.findall(r"\{\s*(?:'((?:[^'\\]|\\.)+)'|(0[xX][0-9a-fA-F]+|\d+))\s*,\s*(\d+)\s*\}", body)
        for chlit, num, w in entries:
            if chlit:
                code = ord(cxx_str(chlit))
            else:
                code = int(num, 0)
            f.write(f"{name}\t{code}\t{w}\n")
            n += 1
    print("std_widths.tsv fonts:", len(fonts), "entries:", n)
