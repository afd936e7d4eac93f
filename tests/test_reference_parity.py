# -*- coding: utf-8 -*-
"""Bit-for-bit parity with the reference's golden fixtures.

Fixtures ported verbatim from the reference test-suite
(/root/reference/tests/test_discover.py:8-211, tests/test_util.py:7-109);
the implementations under test are from-scratch (wdd.kernels).
The live-network download test (test_discover.py:105-113) is intentionally
not ported — no network in this sandbox.
"""
import pytest

from wdd.kernels import (
    calculate_simhash,
    custom_hash_function,
    extract_html_features,
    pack_simhash_to_bytes,
    surt,
    url_is_valid,
)


# --- reference tests/test_discover.py:8-80 ---------------------------------

def test_extract_html_features_repeated_elements_and_spaces():
    html = """<html>
<title>my title</title>
<body>
abc
test

123
abc
  space
</body>
</html>"""
    assert extract_html_features(html) == {
        '123': 1, 'abc': 2, 'my': 1, 'test': 1, 'title': 1, 'space': 1}


def test_extract_html_features_punctuation():
    html = """<html>
<title>my title</title>
<body>
abc
a.b.c.
abc.
test
123
abc
</body>
</html>"""
    assert extract_html_features(html) == {
        '123': 1, 'a': 1, 'abc': 3, 'b': 1, 'c': 1, 'my': 1, 'test': 1,
        'title': 1}


def test_extract_html_features_plain_text():
    assert extract_html_features("just a string") == {
        'just': 1, 'a': 1, 'string': 1}


def test_extract_html_features_skips_comments_scripts_styles():
    html = """<html><head>
</head><body>
<!--[if lt IE 9]>
<!-- Important Owl stylesheet -->
<link rel="stylesheet" href="css/owl.carousel.css">
<!-- Default Theme -->
<link rel="stylesheet" href="css/owl.theme.css">
<script src="js/html5shiv.js"></script>
<script src="js/respond.min.js"></script>
<![endif]-->
<p>Thank you for closing the message box.</p>
<a href="/subpage">test</a>
</body></html>"""
    assert extract_html_features(html) == {
        'box': 1, 'closing': 1, 'for': 1, 'message': 1, 'test': 1,
        'thank': 1, 'the': 1, 'you': 1}


def test_extract_html_features_invalid_and_unicode_chars():
    html = """<html>
<title>Invalid /\x94Invalid\x0b'</title>
<body>
今日は

</body>
</html>"""
    assert extract_html_features(html) == {
        '\x94invalid': 1, 'invalid': 1, '今日は': 1}


def test_extract_html_features_malformed_tags():
    html = """<Html>
    <something>weird is happening \\c\x0b
    <span>tag</span><span>tag</span>
    </HTML>"""
    assert extract_html_features(html) == {
        'c': 1, 'weird': 1, 'is': 1, 'happening': 1, 'tag': 2}


# --- reference tests/test_discover.py:83-85 (the golden integer) -----------

def test_calculate_simhash_golden():
    features = {'two': 2, 'three': 3, 'one': 1}
    assert calculate_simhash(features, 128) == \
        66237222457941138286276456718971054176


# --- reference tests/test_discover.py:116-211 -------------------------------

def test_regular_hash():
    features = {
        '2019': 1, 'advanced': 1, 'google': 1, 'google©': 1, 'history': 1,
        'insearch': 1, 'more': 1, 'optionssign': 1, 'privacy': 1,
        'programsbusiness': 1,
        'searchimagesmapsplayyoutubenewsgmaildrivemorecalendartranslatemobilebooksshoppingbloggerfinancephotosvideosdocseven': 1,
        'searchlanguage': 1, 'settingsweb': 1, 'solutionsabout': 1,
        'terms': 1, 'toolsadvertising': 1, '»account': 1,
    }
    h = calculate_simhash(features, 128)
    assert h.bit_length() == 128
    assert len(pack_simhash_to_bytes(h)) == 16


def test_shortened_hash():
    h_size = 128
    features = {
        'about': 1,
        'accountsearchmapsyoutubeplaynewsgmailcontactsdrivecalendartranslatephotosshoppingmorefinancedocsbooksbloggerhangoutskeepjamboardearthcollectionseven': 1,
        'at': 1, 'data': 1, 'feedbackadvertisingbusiness': 1, 'from': 1,
        'gmailimagessign': 1, 'google': 3, 'helpsend': 1, 'in': 2,
        'inappropriate': 1, 'library': 1, 'local': 1, 'more': 1, 'new': 1,
        'predictions': 1, 'privacytermssettingssearch': 1, 'remove': 1,
        'report': 1, 'searchhistorysearch': 1, 'searchyour': 1,
        'settingsadvanced': 1, 'skills': 1, 'store': 1, 'with': 1, 'your': 1,
        '×develop': 1,
    }
    h = calculate_simhash(features, h_size)
    assert h.bit_length() != h_size
    assert len(pack_simhash_to_bytes(h, h_size)) == h_size // 8


def test_simhash_256():
    h_size = 256
    features = {
        '2019': 1, 'advanced': 1, 'at': 1, 'google': 1,
        'googleadvertising': 1, 'google©': 1, 'history': 1, 'insearch': 1,
        'library': 1, 'local': 1, 'more': 1, 'new': 1, 'optionssign': 1,
        'privacy': 1, 'programsbusiness': 1,
        'searchimagesmapsplayyoutubenewsgmaildrivemorecalendartranslatemobilebooksshoppingbloggerfinancephotosvideosdocseven': 1,
        'searchlanguage': 1, 'settingsweb': 1, 'skills': 1,
        'solutionsabout': 1, 'terms': 1, 'toolsdevelop': 1, 'with': 1,
        'your': 1, '»account': 1,
    }
    h = calculate_simhash(features, h_size, custom_hash_function)
    assert h.bit_length() == h_size
    assert len(pack_simhash_to_bytes(h, h_size)) == h_size // 8


# --- reference tests/test_util.py:64-73 + SURT fixture ----------------------

@pytest.mark.parametrize('url,result', [
    ('http://example.com/', True),
    ('other', False),
    ('torrent:something.gr/file', False),
    ('tel:00302310123456', False),
    ('loudfi1@libero.it', False),
    ('http://roblox', False),
])
def test_url_is_valid(url, result):
    assert url_is_valid(url) == result


def test_surt_golden():
    assert surt('http://example.com') == 'com,example)/'
    assert surt('http://www.example.com/Path?b=2&a=1') == 'com,example)/path?a=1&b=2'


@pytest.mark.parametrize('url,result', [
    # tldextract-parity edges via the offline PSL snapshot (psl.py):
    ('http://co.uk/', False),             # bare public suffix - no domain
    ('http://foo.co.uk/', True),
    ('http://sub.foo.com.au/x', True),
    ('http://com.au', False),
    ('http://foo.notarealtld/', False),   # unknown suffix -> suffix=''
    ('http://192.168.0.1/', False),
    ('http://news.bbc.co.uk', True),
    ('http://x.gov.uk', True),
])
def test_url_is_valid_psl_edges(url, result):
    assert url_is_valid(url) == result


# Recorded tldextract decisions (tldextract 5.x, bundled PSL snapshot,
# default include_psl_private_domains=False — what the reference's
# util.py:106-110 runs with) across >20 suffix classes: legacy gTLDs, new
# gTLDs, assigned + unassigned + retired ccTLDs, two-label public suffixes
# on every populated continent, bare suffixes, and private-section names
# (which tldextract's DEFAULT config splits on the ICANN suffix only).
@pytest.mark.parametrize('url,result', [
    ('http://example.zz/', False),        # unassigned ISO code: NOT a ccTLD
    ('http://example.aq/', True),         # assigned but obscure ccTLD
    ('http://example.an/', False),        # retired ccTLD (Netherlands Antilles)
    ('http://example.gb/', False),        # removed from the PSL (2024)
    ('http://shop.example.app/', True),   # new gTLD
    ('http://example.museum/', True),     # long legacy gTLD
    ('http://foo.github.io/', True),      # private suffix; DEFAULT config
                                          # splits on 'io' -> domain 'github'
    ('http://ac.uk/', False),             # bare two-label suffix
    ('http://x.ac.uk/', True),
    ('http://uni.edu.au/', True),
    ('http://firm.co.jp/', True),
    ('http://go.jp/', False),
    ('http://site.com.br/', True),
    ('http://gov.cn/', False),
    ('http://biz.co.kr/', True),
    ('http://shop.co.in/', True),
    ('http://x.co.za/', True),
    ('http://y.com.sg/', True),
    ('http://z.com.hk/', True),
    ('http://a.com.tr/', True),
    ('http://b.com.mx/', True),
    ('http://c.com.ar/', True),
    ('http://d.com.pl/', True),
    ('http://e.co.il/', True),
    ('http://f.co.th/', True),
    ('http://g.co.nz/', True),
    ('http://h.com.ua/', True),
    ('http://i.gob.pe/', True),
    ('http://j.com.ng/', True),
    ('http://k.co.id/', True),
])
def test_url_is_valid_psl_suffix_classes(url, result):
    assert url_is_valid(url) == result
