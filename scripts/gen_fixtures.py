#!/usr/bin/env python3
"""Generate the reference-shaped JSON ingest fixtures (FIXTURES.md §A).

Deterministic (seed=7, no wall-clock): a tickets.json array + a comments/
directory with per-ticket JSON files whose names start with the ticket id
(wrangler.py:368) and whose values are arrays of comment objects
(wrangler.py:375-379). Shapes mirror every field access in
/root/reference/src/wrangler.py:417-438 — including the edge cases the
reshape must survive: missing `tags`, HTML entities, PII tokens, CRLF,
punct-only noise lines, tickets with no comments file, and an empty
comments array.

Run once; output is committed. Dev tooling only (stdlib, driver-side).
"""
import json
import os
import random

random.seed(7)

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
STATUSES = ["open", "hold", "pending", "solved", "closed"]
TYPES = ["incident", "question", "task", "problem"]
OUTCOMES = ["resolved-workaround", "resolved-fix", "unresolved", None]
WORDS = ("assessment timeout login export dashboard upload sync report "
         "billing invoice error crash slow page api token quota widget "
         "profile search filter").split()
PII = ["user@example.com", "https://status.example.com/x",
       "123e4567-e89b-12d3-a456-426614174000",
       "0123456789abcdef0123456789abcdef", "10.0.0.1"]
ENTITIES = ["&amp;", "&lt;tag&gt;", "&quot;ok&quot;", "&#65;", "&#x42;"]


def ts(day, hour, minute=0):
    return f"2024-03-{day:02d}T{hour:02d}:{minute:02d}:00Z"


def sentence(n):
    return " ".join(random.choice(WORDS) for _ in range(n))


def body(i):
    parts = [sentence(random.randint(4, 10))]
    if i % 3 == 0:
        parts.append(random.choice(PII))
    if i % 4 == 0:
        parts.append(random.choice(ENTITIES))
    txt = " ".join(parts)
    if i % 5 == 0:
        txt += "\r\n---!!---\r\n" + sentence(3)
    return txt


def main():
    os.makedirs(os.path.join(OUT, "comments"), exist_ok=True)
    tickets = []
    for i in range(60):
        tid = 1001 + i
        t = {
            "id": tid,
            "created_at": ts(1 + i % 20, 8 + i % 10),
            "updated_at": ts(10 + i % 18, i % 24),
            "status": STATUSES[i % 5],
            "subject": f"{random.choice(WORDS)} {random.choice(WORDS)} #{tid}",
            "description": body(i),
            "fields": [
                {"id": 1, "value": TYPES[i % 4]},
                {"id": 2, "value": "ignored-by-reference"},
                {"id": 3, "value": OUTCOMES[i % 4]},
            ],
        }
        if i % 7 != 0:  # every 7th ticket has no tags key (default [])
            t["tags"] = random.sample(WORDS, k=1 + i % 3)
        tickets.append(t)

        # every 5th ticket has no comments file (left-join keeps it);
        # every 11th has a file with an empty comments array.
        if i % 5 == 2:
            continue
        comments = []
        if i % 11 != 3:
            for j in range(1 + i % 4):
                comments.append({
                    "id": 50000 + i * 10 + j,
                    "created_at": ts(2 + i % 20, (9 + j) % 24, j * 7),
                    "plain_body": body(i * 10 + j),
                })
        doc = {"comments": comments}
        if i % 6 == 1:  # second array-valued key in the same file
            doc["internal_notes"] = [{
                "id": 90000 + i,
                "created_at": ts(3 + i % 20, 12),
                "plain_body": "note " + sentence(4),
            }]
        with open(os.path.join(OUT, "comments", f"{tid}_comments.json"), "w") as f:
            json.dump(doc, f, indent=1)

    with open(os.path.join(OUT, "tickets.json"), "w") as f:
        json.dump(tickets, f, indent=1)
    print(f"wrote {len(tickets)} tickets, "
          f"{len(os.listdir(os.path.join(OUT, 'comments')))} comment files")


if __name__ == "__main__":
    main()
