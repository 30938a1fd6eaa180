"""Dictionary-scale WorldLocations map (public country/city knowledge).

The reference ships a 6,613-line ``WorldLocations.json``
(``src/crawler.py:19-31``); the miniature fixture in ``locations.py``
exercises the tagger's code paths but not its dictionary scale. This
module builds the same nested shape — continent → {"Zones": [...],
"Countries": [{NAME: [aliases]}]} — from compact public tables: every
UN-member country with its ISO-3166 alpha-3 code, capital, and major
cities, plus US states/state capitals and a world-city list. All names
uppercase (the tagger uppercases tokens before lookup).

Flattened through ``stages.location.build_alias_map`` this yields
~1,900 alias entries — the O(1) hashmap design is identical to the
small fixture; only the dictionary grows. Ambiguous aliases that
collide with common English words (e.g. ISO-3 "AND" for Andorra) are
excluded: the tagger runs on location strings, not prose, but a
stray stopword match would poison every row containing it.
"""

from __future__ import annotations

# (country, ISO-3, capital, [major cities...]) per continent.
# ISO-3 codes that collide with English words are dropped below.
_AFRICA = [
    ("ALGERIA", "DZA", "ALGIERS", ["ORAN"]),
    ("ANGOLA", "AGO", "LUANDA", []),
    ("BENIN", "BEN", "PORTO-NOVO", ["COTONOU"]),
    ("BOTSWANA", "BWA", "GABORONE", []),
    ("BURKINA FASO", "BFA", "OUAGADOUGOU", []),
    ("BURUNDI", "BDI", "GITEGA", ["BUJUMBURA"]),
    ("CABO VERDE", "CPV", "PRAIA", []),
    ("CAMEROON", "CMR", "YAOUNDE", ["DOUALA"]),
    ("CENTRAL AFRICAN REPUBLIC", "CAF", "BANGUI", []),
    ("CHAD", "TCD", "NDJAMENA", []),
    ("COMOROS", "COM", "MORONI", []),
    ("CONGO", "COG", "BRAZZAVILLE", []),
    ("DEMOCRATIC REPUBLIC OF THE CONGO", "COD", "KINSHASA", ["LUBUMBASHI"]),
    ("DJIBOUTI", "DJI", "DJIBOUTI CITY", []),
    ("EGYPT", "EGY", "CAIRO", ["ALEXANDRIA", "GIZA"]),
    ("EQUATORIAL GUINEA", "GNQ", "MALABO", []),
    ("ERITREA", "ERI", "ASMARA", []),
    ("ESWATINI", "SWZ", "MBABANE", []),
    ("ETHIOPIA", "ETH", "ADDIS ABABA", []),
    ("GABON", "GAB", "LIBREVILLE", []),
    ("GAMBIA", "GMB", "BANJUL", []),
    ("GHANA", "GHA", "ACCRA", ["KUMASI"]),
    ("GUINEA", "GIN", "CONAKRY", []),
    ("GUINEA-BISSAU", "GNB", "BISSAU", []),
    ("IVORY COAST", "CIV", "YAMOUSSOUKRO", ["ABIDJAN"]),
    ("KENYA", "KEN", "NAIROBI", ["MOMBASA"]),
    ("LESOTHO", "LSO", "MASERU", []),
    ("LIBERIA", "LBR", "MONROVIA", []),
    ("LIBYA", "LBY", "TRIPOLI", ["BENGHAZI"]),
    ("MADAGASCAR", "MDG", "ANTANANARIVO", []),
    ("MALAWI", "MWI", "LILONGWE", ["BLANTYRE"]),
    ("MALI", "MLI", "BAMAKO", []),
    ("MAURITANIA", "MRT", "NOUAKCHOTT", []),
    ("MAURITIUS", "MUS", "PORT LOUIS", []),
    ("MOROCCO", "MAR", "RABAT", ["CASABLANCA", "MARRAKESH", "FEZ"]),
    ("MOZAMBIQUE", "MOZ", "MAPUTO", []),
    ("NAMIBIA", "NAM", "WINDHOEK", []),
    ("NIGER", "NER", "NIAMEY", []),
    ("NIGERIA", "NGA", "ABUJA", ["LAGOS", "KANO", "IBADAN"]),
    ("RWANDA", "RWA", "KIGALI", []),
    ("SAO TOME AND PRINCIPE", "STP", "SAO TOME", []),
    ("SENEGAL", "SEN", "DAKAR", []),
    ("SEYCHELLES", "SYC", "VICTORIA", []),
    ("SIERRA LEONE", "SLE", "FREETOWN", []),
    ("SOMALIA", "SOM", "MOGADISHU", []),
    ("SOUTH AFRICA", "ZAF", "PRETORIA", ["JOHANNESBURG", "CAPE TOWN", "DURBAN"]),
    ("SOUTH SUDAN", "SSD", "JUBA", []),
    ("SUDAN", "SDN", "KHARTOUM", []),
    ("TANZANIA", "TZA", "DODOMA", ["DAR ES SALAAM"]),
    ("TOGO", "TGO", "LOME", []),
    ("TUNISIA", "TUN", "TUNIS", []),
    ("UGANDA", "UGA", "KAMPALA", []),
    ("ZAMBIA", "ZMB", "LUSAKA", []),
    ("ZIMBABWE", "ZWE", "HARARE", ["BULAWAYO"]),
]

_AMERICA = [
    ("ANTIGUA AND BARBUDA", "ATG", "SAINT JOHNS", []),
    ("ARGENTINA", "ARG", "BUENOS AIRES", ["CORDOBA", "ROSARIO", "MENDOZA"]),
    ("BAHAMAS", "BHS", "NASSAU", []),
    ("BARBADOS", "BRB", "BRIDGETOWN", []),
    ("BELIZE", "BLZ", "BELMOPAN", []),
    ("BOLIVIA", "BOL", "SUCRE", ["LA PAZ", "SANTA CRUZ"]),
    ("BRAZIL", "BRA", "BRASILIA", ["SAO PAULO", "RIO", "RIO DE JANEIRO",
                                   "BELO HORIZONTE", "SALVADOR", "FORTALEZA",
                                   "CURITIBA", "RECIFE", "PORTO ALEGRE"]),
    ("CANADA", "CAN", "OTTAWA", ["TORONTO", "MONTREAL", "VANCOUVER",
                                 "CALGARY", "EDMONTON", "WINNIPEG",
                                 "QUEBEC CITY", "HALIFAX"]),
    ("CHILE", "CHL", "SANTIAGO", ["VALPARAISO"]),
    ("COLOMBIA", "COL", "BOGOTA", ["MEDELLIN", "CALI", "BARRANQUILLA"]),
    ("COSTA RICA", "CRI", "SAN JOSE", []),
    ("CUBA", "CUB", "HAVANA", []),
    ("DOMINICA", "DMA", "ROSEAU", []),
    ("DOMINICAN REPUBLIC", "DOM", "SANTO DOMINGO", []),
    ("ECUADOR", "ECU", "QUITO", ["GUAYAQUIL"]),
    ("EL SALVADOR", "SLV", "SAN SALVADOR", []),
    ("GRENADA", "GRD", "SAINT GEORGES", []),
    ("GUATEMALA", "GTM", "GUATEMALA CITY", []),
    ("GUYANA", "GUY", "GEORGETOWN", []),
    ("HAITI", "HTI", "PORT-AU-PRINCE", []),
    ("HONDURAS", "HND", "TEGUCIGALPA", []),
    ("JAMAICA", "JAM", "KINGSTON", []),
    ("MEXICO", "MEX", "MEXICO CITY", ["GUADALAJARA", "MONTERREY", "TIJUANA",
                                      "PUEBLA", "CANCUN"]),
    ("NICARAGUA", "NIC", "MANAGUA", []),
    ("PANAMA", "PAN", "PANAMA CITY", []),
    ("PARAGUAY", "PRY", "ASUNCION", []),
    ("PERU", "PER", "LIMA", ["AREQUIPA", "CUSCO"]),
    ("SAINT LUCIA", "LCA", "CASTRIES", []),
    ("SURINAME", "SUR", "PARAMARIBO", []),
    ("TRINIDAD AND TOBAGO", "TTO", "PORT OF SPAIN", []),
    ("UNITED STATES", "USA", "WASHINGTON DC", [
        "NEW YORK", "LOS ANGELES", "CHICAGO", "HOUSTON", "PHOENIX",
        "PHILADELPHIA", "SAN ANTONIO", "SAN DIEGO", "DALLAS", "SAN JOSE",
        "AUSTIN", "JACKSONVILLE", "FORT WORTH", "COLUMBUS", "CHARLOTTE",
        "SAN FRANCISCO", "INDIANAPOLIS", "SEATTLE", "DENVER", "BOSTON",
        "EL PASO", "NASHVILLE", "DETROIT", "OKLAHOMA CITY", "PORTLAND",
        "LAS VEGAS", "MEMPHIS", "LOUISVILLE", "BALTIMORE", "MILWAUKEE",
        "ALBUQUERQUE", "TUCSON", "FRESNO", "SACRAMENTO", "KANSAS CITY",
        "MESA", "ATLANTA", "OMAHA", "RALEIGH", "MIAMI", "TAMPA",
        "MINNEAPOLIS", "NEW ORLEANS", "CLEVELAND", "PITTSBURGH",
        "SAINT LOUIS", "CINCINNATI", "ORLANDO", "SALT LAKE CITY",
        "SAN JUAN", "ANCHORAGE", "HONOLULU", "BROOKLYN", "MANHATTAN",
        "SILICON VALLEY", "BAY AREA", "NYC", "REMOTE US", "US REMOTE",
    ]),
    ("URUGUAY", "URY", "MONTEVIDEO", []),
    ("VENEZUELA", "VEN", "CARACAS", ["MARACAIBO"]),
]

# US states + their capitals, all aliases of UNITED STATES
_US_STATES = [
    ("ALABAMA", "MONTGOMERY"), ("ALASKA", "JUNEAU"), ("ARIZONA", "PHOENIX"),
    ("ARKANSAS", "LITTLE ROCK"), ("CALIFORNIA", "SACRAMENTO"),
    ("COLORADO", "DENVER"), ("CONNECTICUT", "HARTFORD"), ("DELAWARE", "DOVER"),
    ("FLORIDA", "TALLAHASSEE"), ("GEORGIA", "ATLANTA"), ("HAWAII", "HONOLULU"),
    ("IDAHO", "BOISE"), ("ILLINOIS", "SPRINGFIELD"),
    ("INDIANA", "INDIANAPOLIS"), ("IOWA", "DES MOINES"), ("KANSAS", "TOPEKA"),
    ("KENTUCKY", "FRANKFORT"), ("LOUISIANA", "BATON ROUGE"),
    ("MAINE", "AUGUSTA"), ("MARYLAND", "ANNAPOLIS"), ("MASSACHUSETTS", "BOSTON"),
    ("MICHIGAN", "LANSING"), ("MINNESOTA", "SAINT PAUL"),
    ("MISSISSIPPI", "JACKSON"), ("MISSOURI", "JEFFERSON CITY"),
    ("MONTANA", "HELENA"), ("NEBRASKA", "LINCOLN"), ("NEVADA", "CARSON CITY"),
    ("NEW HAMPSHIRE", "CONCORD"), ("NEW JERSEY", "TRENTON"),
    ("NEW MEXICO", "SANTA FE"), ("NORTH CAROLINA", "RALEIGH"),
    ("NORTH DAKOTA", "BISMARCK"), ("OHIO", "COLUMBUS"),
    ("OKLAHOMA", "OKLAHOMA CITY"), ("OREGON", "SALEM"),
    ("PENNSYLVANIA", "HARRISBURG"), ("RHODE ISLAND", "PROVIDENCE"),
    ("SOUTH CAROLINA", "COLUMBIA"), ("SOUTH DAKOTA", "PIERRE"),
    ("TENNESSEE", "NASHVILLE"), ("TEXAS", "AUSTIN"), ("UTAH", "SALT LAKE CITY"),
    ("VERMONT", "MONTPELIER"), ("VIRGINIA", "RICHMOND"),
    ("WASHINGTON", "OLYMPIA"), ("WEST VIRGINIA", "CHARLESTON"),
    ("WISCONSIN", "MADISON"), ("WYOMING", "CHEYENNE"),
]

_EUROPE = [
    ("ALBANIA", "ALB", "TIRANA", []),
    ("ANDORRA", "AND", "ANDORRA LA VELLA", []),
    ("AUSTRIA", "AUT", "VIENNA", ["GRAZ", "SALZBURG", "LINZ"]),
    ("BELARUS", "BLR", "MINSK", []),
    ("BELGIUM", "BEL", "BRUSSELS", ["ANTWERP", "GHENT"]),
    ("BOSNIA AND HERZEGOVINA", "BIH", "SARAJEVO", []),
    ("BULGARIA", "BGR", "SOFIA", ["PLOVDIV", "VARNA"]),
    ("CROATIA", "HRV", "ZAGREB", ["SPLIT"]),
    ("CYPRUS", "CYP", "NICOSIA", ["LIMASSOL"]),
    ("CZECH REPUBLIC", "CZE", "PRAGUE", ["BRNO", "OSTRAVA", "CZECHIA"]),
    ("DENMARK", "DNK", "COPENHAGEN", ["AARHUS", "ODENSE"]),
    ("ESTONIA", "EST", "TALLINN", ["TARTU"]),
    ("FINLAND", "FIN", "HELSINKI", ["TAMPERE", "TURKU", "ESPOO"]),
    ("FRANCE", "FRA", "PARIS", ["LYON", "MARSEILLE", "TOULOUSE", "NICE",
                                "NANTES", "BORDEAUX", "LILLE", "STRASBOURG"]),
    ("GERMANY", "DEU", "BERLIN", ["MUNICH", "HAMBURG", "FRANKFURT", "COLOGNE",
                                  "STUTTGART", "DUSSELDORF", "LEIPZIG",
                                  "DRESDEN", "NUREMBERG", "HANOVER", "BREMEN"]),
    ("GREECE", "GRC", "ATHENS", ["THESSALONIKI"]),
    ("HUNGARY", "HUN", "BUDAPEST", ["DEBRECEN"]),
    ("ICELAND", "ISL", "REYKJAVIK", []),
    ("IRELAND", "IRL", "DUBLIN", ["CORK", "GALWAY", "LIMERICK"]),
    ("ITALY", "ITA", "ROME", ["MILAN", "NAPLES", "TURIN", "FLORENCE",
                              "BOLOGNA", "VENICE", "GENOA", "PALERMO"]),
    ("KOSOVO", "XKX", "PRISTINA", []),
    ("LATVIA", "LVA", "RIGA", []),
    ("LIECHTENSTEIN", "LIE", "VADUZ", []),
    ("LITHUANIA", "LTU", "VILNIUS", ["KAUNAS"]),
    ("LUXEMBOURG", "LUX", "LUXEMBOURG CITY", []),
    ("MALTA", "MLT", "VALLETTA", []),
    ("MOLDOVA", "MDA", "CHISINAU", []),
    ("MONACO", "MCO", "MONACO-VILLE", []),
    ("MONTENEGRO", "MNE", "PODGORICA", []),
    ("NETHERLANDS", "NLD", "AMSTERDAM", ["ROTTERDAM", "THE HAGUE", "UTRECHT",
                                         "EINDHOVEN", "HOLLAND"]),
    ("NORTH MACEDONIA", "MKD", "SKOPJE", []),
    ("NORWAY", "NOR", "OSLO", ["BERGEN", "TRONDHEIM", "STAVANGER"]),
    ("POLAND", "POL", "WARSAW", ["KRAKOW", "WROCLAW", "GDANSK", "POZNAN",
                                 "LODZ", "KATOWICE"]),
    ("PORTUGAL", "PRT", "LISBON", ["PORTO", "BRAGA", "COIMBRA"]),
    ("ROMANIA", "ROU", "BUCHAREST", ["CLUJ-NAPOCA", "TIMISOARA", "IASI",
                                     "CLUJ"]),
    ("RUSSIA", "RUS", "MOSCOW", ["SAINT PETERSBURG", "NOVOSIBIRSK",
                                 "YEKATERINBURG", "KAZAN"]),
    ("SAN MARINO", "SMR", "SAN MARINO CITY", []),
    ("SERBIA", "SRB", "BELGRADE", ["NOVI SAD", "NIS"]),
    ("SLOVAKIA", "SVK", "BRATISLAVA", ["KOSICE"]),
    ("SLOVENIA", "SVN", "LJUBLJANA", ["MARIBOR"]),
    ("SPAIN", "ESP", "MADRID", ["BARCELONA", "VALENCIA", "SEVILLE", "BILBAO",
                                "MALAGA", "ZARAGOZA", "ALICANTE"]),
    ("SWEDEN", "SWE", "STOCKHOLM", ["GOTHENBURG", "MALMO", "UPPSALA"]),
    ("SWITZERLAND", "CHE", "BERN", ["ZURICH", "GENEVA", "BASEL", "LAUSANNE",
                                    "ZUG"]),
    ("UKRAINE", "UKR", "KYIV", ["KHARKIV", "ODESA", "LVIV", "DNIPRO", "KIEV"]),
    ("UNITED KINGDOM", "GBR", "LONDON", ["MANCHESTER", "BIRMINGHAM",
                                         "EDINBURGH", "GLASGOW", "LEEDS",
                                         "LIVERPOOL", "BRISTOL", "CAMBRIDGE",
                                         "OXFORD", "BELFAST", "CARDIFF",
                                         "ENGLAND", "SCOTLAND", "WALES",
                                         "NORTHERN IRELAND", "UK",
                                         "GREAT BRITAIN", "BRITAIN"]),
    ("VATICAN CITY", "VAT", "VATICAN", []),
]

_ASIA = [
    ("AFGHANISTAN", "AFG", "KABUL", []),
    ("ARMENIA", "ARM", "YEREVAN", []),
    ("AZERBAIJAN", "AZE", "BAKU", []),
    ("BAHRAIN", "BHR", "MANAMA", []),
    ("BANGLADESH", "BGD", "DHAKA", ["CHITTAGONG"]),
    ("BHUTAN", "BTN", "THIMPHU", []),
    ("BRUNEI", "BRN", "BANDAR SERI BEGAWAN", []),
    ("CAMBODIA", "KHM", "PHNOM PENH", []),
    ("CHINA", "CHN", "BEIJING", ["SHANGHAI", "SHENZHEN", "GUANGZHOU",
                                 "CHENGDU", "HANGZHOU", "WUHAN", "XIAN",
                                 "NANJING", "TIANJIN", "CHONGQING",
                                 "HONG KONG", "MACAU"]),
    # NB: "GEORGIA" also aliases the US state; build_alias_map is
    # first-wins (America precedes Asia), so the bare token maps to
    # UNITED STATES while TBILISI/GEO still map to the country.
    ("GEORGIA", "GEO", "TBILISI", []),
    ("INDIA", "IND", "NEW DELHI", ["MUMBAI", "BANGALORE", "BENGALURU",
                                   "HYDERABAD", "CHENNAI", "KOLKATA", "PUNE",
                                   "AHMEDABAD", "DELHI", "GURGAON", "NOIDA",
                                   "JAIPUR"]),
    ("INDONESIA", "IDN", "JAKARTA", ["SURABAYA", "BANDUNG", "MEDAN", "BALI"]),
    ("IRAN", "IRN", "TEHRAN", ["MASHHAD", "ISFAHAN"]),
    ("IRAQ", "IRQ", "BAGHDAD", ["BASRA", "MOSUL", "ERBIL"]),
    ("ISRAEL", "ISR", "JERUSALEM", ["TEL AVIV", "HAIFA"]),
    ("JAPAN", "JPN", "TOKYO", ["OSAKA", "KYOTO", "YOKOHAMA", "NAGOYA",
                               "SAPPORO", "FUKUOKA", "KOBE", "SENDAI"]),
    ("JORDAN", "JOR", "AMMAN", []),
    ("KAZAKHSTAN", "KAZ", "ASTANA", ["ALMATY"]),
    ("KUWAIT", "KWT", "KUWAIT CITY", []),
    ("KYRGYZSTAN", "KGZ", "BISHKEK", []),
    ("LAOS", "LAO", "VIENTIANE", []),
    ("LEBANON", "LBN", "BEIRUT", []),
    ("MALAYSIA", "MYS", "KUALA LUMPUR", ["PENANG", "JOHOR BAHRU"]),
    ("MALDIVES", "MDV", "MALE", []),
    ("MONGOLIA", "MNG", "ULAANBAATAR", []),
    ("MYANMAR", "MMR", "NAYPYIDAW", ["YANGON"]),
    ("NEPAL", "NPL", "KATHMANDU", []),
    ("NORTH KOREA", "PRK", "PYONGYANG", []),
    ("OMAN", "OMN", "MUSCAT", []),
    ("PAKISTAN", "PAK", "ISLAMABAD", ["KARACHI", "LAHORE", "FAISALABAD"]),
    ("PHILIPPINES", "PHL", "MANILA", ["CEBU", "DAVAO", "QUEZON CITY"]),
    ("QATAR", "QAT", "DOHA", []),
    ("SAUDI ARABIA", "SAU", "RIYADH", ["JEDDAH", "MECCA", "MEDINA", "DAMMAM"]),
    ("SINGAPORE", "SGP", "SINGAPORE CITY", []),
    ("SOUTH KOREA", "KOR", "SEOUL", ["BUSAN", "INCHEON", "DAEGU", "KOREA"]),
    ("SRI LANKA", "LKA", "COLOMBO", ["KANDY"]),
    ("SYRIA", "SYR", "DAMASCUS", ["ALEPPO"]),
    ("TAIWAN", "TWN", "TAIPEI", ["KAOHSIUNG", "TAICHUNG", "HSINCHU"]),
    ("TAJIKISTAN", "TJK", "DUSHANBE", []),
    ("THAILAND", "THA", "BANGKOK", ["CHIANG MAI", "PHUKET"]),
    ("TIMOR-LESTE", "TLS", "DILI", []),
    ("TURKEY", "TUR", "ANKARA", ["ISTANBUL", "IZMIR", "BURSA", "ANTALYA"]),
    ("TURKMENISTAN", "TKM", "ASHGABAT", []),
    ("UNITED ARAB EMIRATES", "ARE", "ABU DHABI", ["DUBAI", "SHARJAH", "UAE"]),
    ("UZBEKISTAN", "UZB", "TASHKENT", ["SAMARKAND"]),
    ("VIETNAM", "VNM", "HANOI", ["HO CHI MINH CITY", "SAIGON", "DA NANG"]),
    ("YEMEN", "YEM", "SANAA", []),
]

_OCEANIA = [
    ("AUSTRALIA", "AUS", "CANBERRA", ["SYDNEY", "MELBOURNE", "BRISBANE",
                                      "PERTH", "ADELAIDE", "GOLD COAST",
                                      "HOBART", "DARWIN"]),
    ("FIJI", "FJI", "SUVA", []),
    ("KIRIBATI", "KIR", "TARAWA", []),
    ("MARSHALL ISLANDS", "MHL", "MAJURO", []),
    ("MICRONESIA", "FSM", "PALIKIR", []),
    ("NAURU", "NRU", "YAREN", []),
    ("NEW ZEALAND", "NZL", "WELLINGTON", ["AUCKLAND", "CHRISTCHURCH",
                                          "HAMILTON NZ"]),
    ("PALAU", "PLW", "NGERULMUD", []),
    ("PAPUA NEW GUINEA", "PNG", "PORT MORESBY", []),
    ("SAMOA", "WSM", "APIA", []),
    ("SOLOMON ISLANDS", "SLB", "HONIARA", []),
    ("TONGA", "TON", "NUKUALOFA", []),
    ("TUVALU", "TUV", "FUNAFUTI", []),
    ("VANUATU", "VUT", "PORT VILA", []),
]

# ISO-3 codes that collide with English words / other aliases
_ISO3_EXCLUDE = {"AND", "CAN", "COD", "COM", "GIN", "MAR", "MUS", "NIC",
                 "PAN", "PER", "SUR", "TON", "WSM", "MLI", "BEN"}

_ZONES = {
    "Africa": ["AFRICA", "MEA", "SSA"],
    "America": ["LATAM", "NORTH AMERICA", "SOUTH AMERICA", "AMERICAS",
                "CENTRAL AMERICA", "CARIBBEAN"],
    "Europe": ["EMEA", "EU", "EEA", "EASTERN EUROPE", "WESTERN EUROPE",
               "NORDICS", "SCANDINAVIA", "BENELUX", "BALKANS", "BALTICS",
               "DACH", "CEE", "IBERIA"],
    "Asia": ["APAC", "ASIA PACIFIC", "SOUTHEAST ASIA", "MIDDLE EAST",
             "SOUTH ASIA", "EAST ASIA", "GCC", "ASEAN"],
    "Oceania": ["OCEANIA", "ANZ", "PACIFIC"],
    "Worldwide": ["GLOBAL", "ANYWHERE", "REMOTE", "DISTRIBUTED",
                  "WORK FROM HOME", "WFH", "FULLY REMOTE", "REMOTE FIRST",
                  "100% REMOTE", "INTERNATIONAL"],
}


def _build() -> dict:
    def countries(rows):
        out = []
        for name, iso3, capital, cities in rows:
            aliases = [capital, *cities]
            if iso3 not in _ISO3_EXCLUDE:
                aliases.append(iso3)
            out.append({name: aliases})
        return out

    world = {
        "Africa": {"Zones": _ZONES["Africa"], "Countries": countries(_AFRICA)},
        "America": {"Zones": _ZONES["America"], "Countries": countries(_AMERICA)},
        "Europe": {"Zones": _ZONES["Europe"], "Countries": countries(_EUROPE)},
        "Asia": {"Zones": _ZONES["Asia"], "Countries": countries(_ASIA)},
        "Oceania": {"Zones": _ZONES["Oceania"], "Countries": countries(_OCEANIA)},
        "Worldwide": {
            "Zones": _ZONES["Worldwide"],
            "Countries": [{"WORLDWIDE": ["WORLDWIDE", "ANYWHERE", "GLOBAL",
                                         "REMOTE", "EVERYWHERE"]}],
        },
    }
    # US states + state capitals → UNITED STATES aliases
    us = next(c for c in world["America"]["Countries"] if "UNITED STATES" in c)
    seen = set(us["UNITED STATES"])
    for state, capital in _US_STATES:
        for a in (state, capital):
            if a not in seen:
                seen.add(a)
                us["UNITED STATES"].append(a)
    return world


WORLD_LOCATIONS_FULL: dict = _build()
