"""Adversarial messy-HTML coverage for the ten round-6 extractors
(nav, links, tables, forms, images, text-structure, scripts, pricing,
customers/partners, team) — handcrafted tag soup exercised directly
on the parser closures, mirroring tests/test_html.py's job-card
treatment: unquoted/missing attrs, unclosed and nested tags,
uppercase markup, malformed JSON. The reference tolerates all of
these via BeautifulSoup (/root/reference/src/scraper_v2.py:120-466);
the templated oracle fixtures cannot prove it, so these pin it."""

from __future__ import annotations

import pandas as pd

from project_orbit_spark.functions.html_extract import (
    is_valid_team_member,
    make_customer_partner_parser,
    make_form_extractor,
    make_image_inventory_extractor,
    make_link_inventory_extractor,
    make_nav_extractor,
    make_pricing_page_parser,
    make_script_inventory_extractor,
    make_table_extractor,
    make_team_extractor,
    make_text_structure_extractor,
)

BASE = "https://x.com/p/q"


def run(extractor, html: str, base: str | None = None) -> pd.DataFrame:
    cols = {"doc_id": [1], "html": [html]}
    if base is not None:
        cols["base_url"] = [base]
    return pd.concat(list(extractor(iter([pd.DataFrame(cols)]))), ignore_index=True)


class TestNavMessy:
    def test_plain_list_nested_in_breadcrumb_does_not_close_region(self):
        # regression (ADVICE r6): the </ul> of a PLAIN nested list used
        # to decrement the breadcrumb counter and orphan later crumbs
        html = (
            "<nav class='breadcrumb'>"
            "<a href='/a'>A</a>"
            "<ul><a href='/sub'>Sub</a></ul>"
            "<a href='/b'>B</a>"
            "</nav>"
        )
        out = run(make_nav_extractor(), html, BASE)
        crumbs = out[out.region == "breadcrumbs"].text.tolist()
        assert crumbs == ["A", "Sub", "B"]

    def test_breadcrumb_nav_inside_open_nav_keeps_outer_region(self):
        # regression (ADVICE r6): closing a breadcrumb-classed <nav>
        # nested in a plain <nav> used to decrement nav_depth instead
        html = (
            "<nav><a href='/m1'>M1</a>"
            "<nav class='breadcrumb'><a href='/c'>C</a></nav>"
            "<a href='/m2'>M2</a></nav>"
        )
        out = run(make_nav_extractor(), html, BASE)
        assert out[out.region == "main_nav"].text.tolist() == ["M1", "M2"]
        assert out[out.region == "breadcrumbs"].text.tolist() == ["C"]

    def test_uppercase_and_unquoted_attrs(self):
        html = "<NAV><A HREF=/up>Up</A></NAV>"
        out = run(make_nav_extractor(), html, BASE)
        assert out.iloc[0].href == "https://x.com/up"

    def test_self_closing_nav_stays_open_lxml_parity(self):
        # HTML5/lxml ignore the "/" on a non-void start tag, so
        # <nav/> OPENS a nav that wraps everything after it (until a
        # real </nav> or document end) — the reference's
        # BeautifulSoup(html, 'lxml') sees the later anchors INSIDE
        # that nav, and so do we. (Deviation note: the reference's
        # overlapping find_all would list F under BOTH main_nav and
        # footer; our one-region-per-anchor model keeps the innermost.)
        html = (
            "<nav/>"
            "<p><a href='/outside'>Outside</a></p>"
            "<footer><a href='/f'>F</a></footer>"
        )
        out = run(make_nav_extractor(), html, BASE)
        assert out[out.region == "main_nav"].text.tolist() == ["Outside"]
        assert out[out.region == "footer"].text.tolist() == ["F"]

    def test_stray_unmatched_close_inside_anchor_keeps_full_text(self):
        # regression (ADVICE r8): a </ul> that was never opened used to
        # flush the open anchor (truncating its text); lxml drops
        # unmatched end tags entirely, so the anchor keeps capturing
        html = "<nav><a href='/m'>Long <b>anchor</b></ul> text</a></nav>"
        out = run(make_nav_extractor(), html, BASE)
        assert out.text.tolist() == ["Long anchor text"]

    def test_unclosed_li_run_inside_nav_keeps_all_anchors(self):
        # lxml parity (ADVICE r7 follow-up): successive <li> without
        # closes inside a nav region — li is not a region tag, so the
        # implied closes must not disturb region scoping
        html = (
            "<nav><ul><li><a href='/a'>A</a>"
            "<li><a href='/b'>B</a><li><a href='/c'>C</a></ul></nav>"
        )
        out = run(make_nav_extractor(), html, BASE)
        assert out[out.region == "main_nav"].text.tolist() == ["A", "B", "C"]

    def test_self_closing_anchor_emits_empty_text_row(self):
        # BeautifulSoup's find_all('a', href=True) sees <a href=x/> as
        # an empty anchor; so do we (one row, empty text)
        html = "<nav><a href='/i' /><a href='/j'>J</a></nav>"
        out = run(make_nav_extractor(), html, BASE)
        assert out.text.tolist() == ["", "J"]
        assert out.href.tolist() == ["https://x.com/i", "https://x.com/j"]


class TestLinksMessy:
    def test_netloc_less_href_is_same_domain_not_external(self):
        html = "<a href='/career/open'>Jobs</a><a href='https://other.io/x'>X</a>"
        out = run(make_link_inventory_extractor(), html, BASE)
        first, second = out.iloc[0], out.iloc[1]
        assert (first.category, first.is_external, first.is_same_domain) == ("careers", 0, 1)
        assert (second.is_external, second.is_same_domain) == (1, 0)

    def test_category_ladder_first_rung_wins_and_unclosed_anchor(self):
        # '/career' (rung 1) must beat '/blog' (rung 3) in the same href;
        # the second anchor is never closed -> dropped, like BS's tree
        html = "<a href='/blog/career-tips'>T</a><a href='/about'>Dangling"
        out = run(make_link_inventory_extractor(), html, BASE)
        assert out.category.tolist() == ["careers"]


class TestTablesMessy:
    def test_uppercase_table_with_inline_markup_in_cells(self):
        html = (
            "<TABLE><TR><TH>Name</TH><TH>Role</TH></TR>"
            "<TR><TD><b>Ada</b> L.</TD><TD>Eng</TD></TR></TABLE>"
        )
        out = run(make_table_extractor(), html)
        assert out[out.kind == "header"].value.tolist() == ["Name", "Role"]
        assert out[out.kind == "cell"].value.tolist() == ["Ada L.", "Eng"]

    def test_zero_data_row_table_dropped_and_numbering_continues(self):
        html = (
            "<table><tr><th>OnlyHeaders</th></tr></table>"
            "<table><tr><th>H</th></tr><tr><td>v</td></tr></table>"
        )
        out = run(make_table_extractor(), html)
        assert set(out.tbl) == {1}, "header-only table must be dropped entirely"
        assert out[out.kind == "cell"].value.tolist() == ["v"]


class TestFormsMessy:
    def test_fieldless_form_emits_null_field_row(self):
        out = run(make_form_extractor(), "<form action='/go' method='post'></form>")
        row = out.iloc[0]
        assert (row.form_pos, row.field_pos, row.method) == (1, 0, "POST")
        assert row.ftype is None

    def test_void_inputs_and_label_found_after_the_form(self):
        # inputs are void elements (never closed); the label-for lives
        # AFTER the form and must still resolve (page-wide label map)
        html = (
            "<form><input type=email name=em id=em-id required>"
            "<textarea name=msg></textarea></form>"
            "<label for='em-id'>Your <b>email</b></label>"
        )
        out = run(make_form_extractor(), html)
        em = out[out.name == "em"].iloc[0]
        assert (em.ftype, em.required, em.label) == ("email", 1, "Your email")
        assert out[out.name == "msg"].iloc[0].ftype == "textarea"


class TestImagesMessy:
    def test_src_fallback_chain_and_sourceless_skipped(self):
        html = (
            "<img data-lazy-src='/lazy.png' alt='Lazy'>"
            "<img alt='no source at all'>"
            "<img data-src='/ds.png' src='/real.png' alt='Both'>"
        )
        out = run(make_image_inventory_extractor(), html, BASE)
        assert out.src.tolist() == ["/lazy.png", "/real.png"]
        assert out.full_url.tolist() == ["https://x.com/lazy.png", "https://x.com/real.png"]

    def test_is_logo_from_class_even_without_alt(self):
        html = "<img src='l.svg' class='navbar-Brand-mark'>"
        out = run(make_image_inventory_extractor(), html, BASE)
        assert out.iloc[0].is_logo == 1 and out.iloc[0].alt == ""


class TestTextStructureMessy:
    def test_by_level_heading_order_and_stray_close_tags(self):
        html = (
            "</div><h2>Second-level first</h2><h1>Top</h1>"
            "<p>short</p><p>long enough paragraph</p></span>"
        )
        out = run(make_text_structure_extractor(), html)
        heads = out[out.kind == "heading"]
        assert heads.attr.tolist() == ["h1", "h2"], "levels outermost, not doc order"
        assert out[out.kind == "paragraph"].text.tolist() == ["long enough paragraph"]

    def test_code_text_unstripped_and_empty_list_skipped(self):
        html = "<pre>  indented()\n</pre><ul></ul><ol><li>one</li></ol>"
        out = run(make_text_structure_extractor(), html)
        assert out[out.kind == "code"].text.tolist() == ["  indented()\n"]
        li = out[out.kind == "list_item"]
        assert li.attr.tolist() == ["ol2"], "empty ul still counts in container numbering"


class TestScriptsMessy:
    def test_malformed_json_ld_not_flagged_as_json(self):
        html = (
            "<script type='application/ld+json'>{\"a\": unquoted}</script>"
            "<script>[1, 2, 3]</script>"
        )
        out = run(make_script_inventory_extractor(), html)
        assert out.has_json.tolist() == [0, 1]

    def test_valueless_async_defer_attrs(self):
        html = "<script src='/a.js' async defer></script>"
        row = run(make_script_inventory_extractor(), html).iloc[0]
        assert (row.is_async, row.is_defer, row.content_length) == (1, 1, 0)


class TestPricingMessy:
    def test_nested_div_inside_card_keeps_trailing_text(self):
        # regression (ADVICE r6): the nested plain <div> used to close
        # the card, losing the trailing '$49' price text
        html = (
            "<div class='plan-card'>Starter"
            "<div class='blurb'>for teams</div>"
            "$49/mo</div>"
        )
        out = run(make_pricing_page_parser(), html)
        row = out.iloc[0]
        assert (row.tier_name, row.price) == ("Starter", "$49")

    def test_heading_fallback_and_model_ladder(self):
        html = (
            "<p>Pay per seat today; enterprise? contact us.</p>"
            "<H3>Premium offering</H3>"
        )
        out = run(make_pricing_page_parser(), html)
        row = out.iloc[0]
        # 'per seat' outranks enterprise+contact in the model ladder
        assert (row.pricing_model, row.tier_name, row.price) == ("per-seat", "Premium", None)


class TestMentionsMessy:
    def test_logo_alt_asymmetry_customers_exclude_partners_keep(self):
        html = "<img src='a.png' alt='Acme Logo'/><img src=b.png alt='BetaCo'>"
        out = run(make_customer_partner_parser(), html)
        assert out[out.kind == "customer"].name.tolist() == ["BetaCo"]
        assert out[out.kind == "partner"].name.tolist() == ["Acme Logo", "BetaCo"]

    def test_oversized_items_gated_and_section_scoping(self):
        big = "x" * 120
        html = (
            f"<ul class='customer-list'><li>Globex</li><li>{big}</li></ul>"
            "<ul><li>Unscoped</li></ul>"
        )
        out = run(make_customer_partner_parser(), html)
        assert out[out.kind == "customer"].name.tolist() == ["Globex"]
        assert "Unscoped" not in set(out.name)


class TestTeamMessy:
    def test_unclosed_img_headshot_does_not_swallow_later_cards(self):
        # void-element regression: an <img> (no close tag) inside the
        # first card used to unbalance the depth counter so no card
        # ever closed and the whole page yielded nothing
        card = (
            "<div class='team-member'><img src='{p}.jpg' alt=''>"
            "<h3>{n}</h3><p>CEO</p></div>"
        )
        html = card.format(p="a", n="Ada Lovelace") + card.format(p="b", n="Grace Hopper")
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Ada Lovelace", "Grace Hopper"]

    def test_single_card_page_gated_and_speak_prefix_rejected(self):
        # the reference's >1-matches pattern gate: one card -> nothing
        one = "<div class='person'><h3>Ada Lovelace</h3></div>"
        assert run(make_team_extractor(), one).empty
        # regression (ADVICE r6): the reference's 'speak ' location
        # prefix rejection (scraper_v2.py ~2905)
        assert not is_valid_team_member("Speak With Us")
        assert is_valid_team_member("Speakman Jones")  # prefix only, not substring

    def test_unclosed_trailing_p_implied_closed_at_card_end(self):
        # lxml parity (ADVICE r7): a card whose last <p> is never
        # closed used to leave the depth counter high, so the card's
        # </div> didn't close it and every later card was swallowed
        html = (
            "<div class='team-member'><h3>Ada Lovelace</h3><p>CEO</div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Ada Lovelace", "Grace Hopper"]
        assert out.job_title.tolist() == ["CEO", "CTO"]

    def test_block_start_implies_p_close(self):
        # <p>bio<div> — lxml closes the p BEFORE the div starts, so the
        # div's own close balances and the role text stays the first p
        html = (
            "<div class='team-member'><h3>Ada Lovelace</h3>"
            "<p>CEO<div class='badge'>x</div></div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Ada Lovelace", "Grace Hopper"]
        assert out.job_title.tolist() == ["CEO", "CTO"]

    def test_unclosed_li_chain_inside_card_balances(self):
        # successive <li> without closes: each new <li> implies the
        # previous one closed; the </ul> ends the last one
        html = (
            "<div class='team-member'><h3>Ada Lovelace</h3><p>CEO</p>"
            "<ul><li>a<li>b<li>c</ul></div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Ada Lovelace", "Grace Hopper"]

    def test_stray_p_close_does_not_over_decrement(self):
        # </p> with no open p (already implied-closed): ignored, the
        # card still closes exactly at its own </div>
        html = (
            "<div class='team-member'><h3>Ada Lovelace</h3>"
            "<p>CEO<div class='x'>y</div></p></div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Ada Lovelace", "Grace Hopper"]

    def test_hr_implies_p_close_inside_card(self):
        # regression (ADVICE r8): <hr> is void (never pushed) but IS in
        # the HTML5 p-closers list — '<p>CEO<hr>after' must end the
        # role grab at the <hr> like lxml, not keep capturing 'after'
        html = (
            "<div class='team-member'><h3>Ada Lovelace</h3>"
            "<p>CEO<hr>not the role</p></div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Ada Lovelace", "Grace Hopper"]
        assert out.job_title.tolist() == ["CEO", "CTO"]

    def test_self_closing_div_inside_card_stays_open(self):
        # regression (ADVICE r8): lxml ignores the "/" on a non-void
        # tag, so <div/> OPENS a div and the card's next </div> closes
        # that inner div — the <p>CEO</p> after it is still INSIDE the
        # card (treating <div/> as open+close would end the card early
        # and lose the role)
        html = (
            "<div class='team-member'><h3>Ada Lovelace</h3>"
            "<div/></div><p>CEO</p></div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Ada Lovelace", "Grace Hopper"]
        assert out.job_title.tolist() == ["CEO", "CTO"]

    def test_unclosed_p_before_first_card_ignored(self):
        # lxml parity (ADVICE r7 follow-up): an unclosed <p> BEFORE any
        # card — pre-card content is out of scope, the cards still
        # open, parse, and close normally
        html = (
            "<p>intro paragraph never closed"
            "<div class='team-member'><h3>Ada Lovelace</h3><p>CEO</p></div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Ada Lovelace", "Grace Hopper"]
        assert out.job_title.tolist() == ["CEO", "CTO"]

    def test_implied_close_ending_card_mid_drain_does_not_crash(self):
        # regression (review r8): stray inline closes undercounting
        # the scope used to let a </li> drain hit an emptied stack and
        # raise IndexError, killing the whole Spark task
        html = (
            '<div class="team-member"><h3>Xavier Yang</h3>'
            "<li><p>bio</b></b></li></div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Xavier Yang", "Grace Hopper"]

    def test_unmatched_container_close_is_dropped(self):
        # regression (review r8): a stray </form> never opened in the
        # card must be ignored (lxml drops unmatched closes) — it used
        # to close the card early and lose the LinkedIn anchor
        html = (
            "<div class='team-member'><h3>Ada Lovelace</h3><p>CEO</form>"
            "<a href='https://linkedin.com/in/ada'>profile</a></div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        ada = out[out.name == "Ada Lovelace"]
        assert ada.same_as.tolist() == ["https://linkedin.com/in/ada"]

    def test_unclosed_inline_tag_popped_by_enclosing_close(self):
        # regression (review r8): <p><b>CEO</p> — the unclosed <b>
        # must be implied-closed by </p> (pop-to-match), not leak a
        # scope level that swallows every later card
        html = (
            "<div class='team-member'><h3>Ada Lovelace</h3><p><b>CEO</p>"
            "<a href='https://linkedin.com/in/ada'>x</a></div>"
            "<div class='team-member'><h3>Grace Hopper</h3><p>CTO</p></div>"
        )
        out = run(make_team_extractor(), html)
        assert out.name.tolist() == ["Ada Lovelace", "Grace Hopper"]
        assert out.job_title.tolist() == ["CEO", "CTO"]
        assert out.same_as.tolist()[0] == "https://linkedin.com/in/ada"


def test_self_closing_breadcrumb_container_stays_open():
    # regression (review r8): HTML5/lxml ignore the "/" on a non-void
    # start tag, so <ol class='breadcrumb'/> OPENS the breadcrumb
    # region — treating it as open+close burned the one-container
    # budget and dropped every real crumb that followed
    html = (
        "<ol class='breadcrumb'/>"
        "<ol class='breadcrumb'><li><a href='/a'>A</a></li></ol>"
    )
    out = run(make_nav_extractor(), html, base="https://x.com")
    crumbs = out[out.region == "breadcrumbs"]
    assert crumbs.text.tolist() == ["A"]
    assert crumbs.href.tolist() == ["https://x.com/a"]


def test_greenhouse_token_scans_past_non_matching_scripts(spark):
    # regression (ADVICE r6): a page whose FIRST boardToken-mentioning
    # script doesn't match the assignment regex must fall through to
    # the next script, like the reference's scan-until-match loop
    from project_orbit_spark.sources.ats import discover_greenhouse_board

    html = (
        "<script>// docs: set boardToken before loading</script>"
        "<script>var cfg = {\"boardToken\": \"realtok\"};</script>"
    )
    page = spark.createDataFrame([(1, html)], "doc_id long, html string")
    row = discover_greenhouse_board(page).collect()[0]
    assert (row.method, row.board_token) == ("script", "realtok")
    assert row.api_url == "https://boards-api.greenhouse.io/v1/boards/realtok/jobs"
