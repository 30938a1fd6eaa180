"""Miniature WorldLocations map (FIXTURES.md §6).

Same nested shape as the reference's 6,613-line
``src/resources/data/WorldLocations.json`` (typed at
``src/crawler.py:24-31``): continent → {"Zones": [...], "Countries":
[{name: [aliases]}]}. Includes multi-token names ("NEW YORK",
"UNITED STATES", "SAO PAULO") to exercise the compound-word retry at
``src/crawler.py:88-101``, and the WORLDWIDE alias group.
"""

WORLD_LOCATIONS: dict = {
    "America": {
        "Zones": ["LATAM", "NORTH AMERICA"],
        "Countries": [
            {"UNITED STATES": ["USA", "NEW YORK", "AUSTIN", "TEXAS"]},
            {"BRAZIL": ["SAO PAULO", "RIO"]},
        ],
    },
    "Europe": {
        "Zones": ["EMEA"],
        "Countries": [
            {"UNITED KINGDOM": ["LONDON", "UK"]},
            {"GERMANY": ["BERLIN"]},
            {"SPAIN": ["MADRID"]},
            {"FRANCE": ["PARIS"]},
        ],
    },
    "Asia": {
        "Zones": ["APAC"],
        "Countries": [{"JAPAN": ["TOKYO"]}],
    },
    "Worldwide": {
        "Zones": ["GLOBAL", "ANYWHERE"],
        "Countries": [{"WORLDWIDE": ["WORLDWIDE", "ANYWHERE", "GLOBAL"]}],
    },
}
