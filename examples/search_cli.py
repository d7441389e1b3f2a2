"""Terminal search client against a running node's JSON API.

Capability-envelope twin of the reference's raw query client
(/root/reference/examples_old/search_udp.rs) — but over the node's HTTP
API, which is the supported programmatic surface.

Run: python examples/search_cli.py "your query" [http://host:8080]
"""

from __future__ import annotations

import json
import sys
import urllib.parse
import urllib.request


def search(query: str, base: str = "http://127.0.0.1:8080") -> None:
    url = f"{base}/api/search?q={urllib.parse.quote(query)}"
    with urllib.request.urlopen(url, timeout=120) as r:
        data = json.loads(r.read())
    print(f"Searched {data['pages_searched']} pages on "
          f"{data['instances_contacted']} instances in "
          f"{data['seconds']:.3f}s\n")
    for i, hit in enumerate(data["results"], 1):
        print(f"{i:2d}. [{hit['distance']:.4f}] {hit['title'] or hit['url']}")
        print(f"    {hit['url']}")
        snippet = hit["text"][:160].replace("\n", " ")
        print(f"    {snippet}\n")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    search(sys.argv[1], sys.argv[2] if len(sys.argv) > 2
           else "http://127.0.0.1:8080")
