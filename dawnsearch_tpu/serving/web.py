"""HTML surface: search box, results list, stats line.

Rebuild of the reference's format!-template renderer
(/root/reference/src/net/web.rs — "Who needs a templating engine",
web.rs:24-26): main page (web.rs:219-282), results page with the
"Searched N pages on M instances in S seconds" line (web.rs:316-323),
per-hit distance + explore link `?s=instance:page` (web.rs:335-338),
escaped title/url/text (web.rs:325-356).
"""

from __future__ import annotations

import html

from dawnsearch_tpu.index.provider import SearchResult

_STYLE = """
body { font-family: system-ui, sans-serif; max-width: 48rem; margin: 2rem auto;
       padding: 0 1rem; color: #1a1a1a; }
a { color: #0b57d0; text-decoration: none; }
a:hover { text-decoration: underline; }
.result { margin: 1.2rem 0; }
.result .url { color: #006621; font-size: 0.85rem; }
.result .dist { color: #777; font-size: 0.8rem; margin-left: 0.5rem; }
.result p { margin: 0.2rem 0; color: #444; }
.stats { color: #777; font-size: 0.85rem; margin-top: 1rem; }
input[type=text] { width: 70%; padding: 0.5rem; font-size: 1rem; }
input[type=submit] { padding: 0.5rem 1rem; font-size: 1rem; }
h1 a { color: inherit; }
"""


def search_box(query: str = "") -> str:
    """(web.rs:303-314)"""
    return (
        '<form action="/" method="get">'
        f'<input type="text" name="q" value="{html.escape(query, quote=True)}" '
        'autofocus> <input type="submit" value="Search"></form>'
    )


def page(title: str, body: str) -> str:
    """Outer shell (web.rs:28-217, minus the inline marketing copy)."""
    return (
        "<!DOCTYPE html><html><head>"
        f"<meta charset='utf-8'><title>{html.escape(title)}</title>"
        f"<style>{_STYLE}</style></head><body>"
        "<h1><a href='/'>DawnSearch</a></h1>"
        f"{body}</body></html>"
    )


def main_page() -> str:
    """Landing page (web.rs:219-282)."""
    return page(
        "DawnSearch",
        search_box()
        + "<p>TPU-native distributed semantic search. Type a phrase; "
        "results rank by meaning, not keywords.</p>",
    )


def format_results(result: SearchResult, seconds: float) -> str:
    """Hits + stats line (web.rs:316-358)."""
    out = [
        f'<div class="stats">Searched {result.pages_searched} pages on '
        f"{result.instances_contacted} instances in {seconds:.2f} seconds</div>"
    ]
    for p in result.pages:
        title = html.escape(p.title or p.url)
        url = html.escape(p.url, quote=True)
        text = html.escape(p.text[:500])
        explore = html.escape(f"{p.instance_id}:{p.page_id}", quote=True)
        # Stored URLs are attacker-controlled (hostile peers replicate
        # pages; /api/insert accepts them): html.escape neutralizes
        # markup but not the URI scheme, so a javascript: URL would
        # execute in this UI's origin on click. Link only http(s);
        # anything else renders as text. (The reference shares the
        # flaw, web.rs:325 — this is a deliberate hardening departure.)
        linkable = p.url.lower().startswith(("http://", "https://"))
        link = (f'<a href="{url}">{title}</a>' if linkable
                else f"<span>{title}</span>")
        out.append(
            '<div class="result">'
            f"{link}"
            f'<span class="dist">{p.distance:.4f} '
            f'<a href="/?s={explore}">more like this</a></span>'
            f'<div class="url">{url}</div><p>{text}</p></div>'
        )
    if not result.pages:
        out.append("<p>No results.</p>")
    return "".join(out)


def results_page(query: str, result: SearchResult, seconds: float) -> str:
    """(web.rs:284-301)"""
    return page(
        f"{query} - DawnSearch",
        search_box(query) + format_results(result, seconds),
    )


def error_page(message: str) -> str:
    return page("DawnSearch - error",
                f"<p>{html.escape(message)}</p>" + search_box())
