package graft.analysis

/**
 * Krovetz inflectional stemmer — rule-faithful re-implementation from the
 * published algorithm (R. Krovetz, "Viewing Morphology as an Inference
 * Process", SIGIR 1993), the stemmer behind the reference's DEFAULT index
 * tag (`analysis/Analyzers.java:95-101`, default at
 * `cmdline/IndexerTool.java:42-43`).
 *
 * Krovetz's design: inflectional suffix removal (plural, past tense,
 * present participle) where a LEXICON arbitrates between candidate stems
 * (keep the -e? undouble the consonant? leave the word alone?). The
 * reference's Lucene `KStemFilter` ships a ~30k-entry lexicon; embedding
 * that wholesale is neither possible (we only re-implement from the
 * published algorithm) nor useful at transcript scale. This implementation
 * is the COMPLETE rule skeleton with a documented SUBSET lexicon:
 *
 *  - [[Exceptions]] — the paper's direct-conflation table for irregular
 *    morphology (children → child, …).
 *  - [[Lexicon]] — head words that (a) must never be stemmed (species,
 *    thing, during, …) and (b) license e-restoration (filing → file
 *    because "file" is a word; walking → walk because "walke" is not).
 *
 * Consequence (documented deviation): conflations that depend on lexicon
 * entries OUTSIDE the subset fall back to the deterministic rule outcome
 * (e.g. an unusual "-es" noun may keep its "-e"). The rules themselves —
 * order, guards, undoubling, y-restoration — follow the paper exactly.
 * Golden-gated by `g2_kstem_golden`.
 */
object KStem {

  /** Direct conflations for irregular forms (paper §3 "irregular
   * morphology" table, subset). */
  val Exceptions: Map[String, String] = Map(
    "children" -> "child", "men" -> "man", "women" -> "woman",
    "feet" -> "foot", "teeth" -> "tooth", "geese" -> "goose",
    "mice" -> "mouse", "lice" -> "louse", "oxen" -> "ox",
    "dice" -> "die", "indices" -> "index", "matrices" -> "matrix",
    "vertices" -> "vertex", "indexes" -> "index",
    "wives" -> "wife", "knives" -> "knife", "lives" -> "life",
    "leaves" -> "leaf", "halves" -> "half", "shelves" -> "shelf",
    "data" -> "datum", "criteria" -> "criterion", "phenomena" -> "phenomenon",
    "went" -> "go", "gone" -> "go", "ran" -> "run", "took" -> "take",
    "taken" -> "take", "gave" -> "give", "given" -> "give",
    "wrote" -> "write", "written" -> "write", "came" -> "come",
    "saw" -> "see", "seen" -> "see", "made" -> "make", "found" -> "find",
    "got" -> "get", "gotten" -> "get", "sent" -> "send", "built" -> "build",
    "kept" -> "keep", "held" -> "hold", "left" -> "leave", "meant" -> "mean",
    "met" -> "meet", "paid" -> "pay", "said" -> "say", "sold" -> "sell",
    "told" -> "tell", "thought" -> "think", "brought" -> "bring",
    "bought" -> "buy", "caught" -> "catch", "taught" -> "teach",
    "chose" -> "choose", "chosen" -> "choose", "drew" -> "draw",
    "drawn" -> "draw", "grew" -> "grow", "grown" -> "grow",
    "knew" -> "know", "known" -> "know", "threw" -> "throw",
    "thrown" -> "throw", "spoke" -> "speak", "spoken" -> "speak",
    "stood" -> "stand", "understood" -> "understand", "began" -> "begin",
    "begun" -> "begin", "broke" -> "break", "broken" -> "break",
    "fell" -> "fall", "fallen" -> "fall", "felt" -> "feel", "lost" -> "lose",
    "read" -> "read", "ate" -> "eat", "eaten" -> "eat",
    "swam" -> "swim", "sang" -> "sing", "sung" -> "sing",
    "rang" -> "ring", "rung" -> "ring", "wore" -> "wear", "worn" -> "wear",
    // round-5 growth: further standard irregular verbs (ambiguous forms
    // that are common head words themselves — ground, rose, bound, wound,
    // left-as-direction … — are deliberately NOT conflated), plus the
    // -oes plurals the es-rule cannot derive
    "became" -> "become", "drank" -> "drink", "drunk" -> "drink",
    "drove" -> "drive", "driven" -> "drive", "blew" -> "blow",
    "blown" -> "blow", "flew" -> "fly", "flown" -> "fly",
    "froze" -> "freeze", "frozen" -> "freeze", "hid" -> "hide",
    "hidden" -> "hide", "rode" -> "ride", "ridden" -> "ride",
    "risen" -> "rise", "shook" -> "shake", "shaken" -> "shake",
    "shrank" -> "shrink", "shrunk" -> "shrink", "slept" -> "sleep",
    "slid" -> "slide", "spent" -> "spend", "stole" -> "steal",
    "stolen" -> "steal", "struck" -> "strike", "swept" -> "sweep",
    "swore" -> "swear", "sworn" -> "swear", "swung" -> "swing",
    "tore" -> "tear", "torn" -> "tear", "wept" -> "weep",
    "woke" -> "wake", "woken" -> "wake", "forgot" -> "forget",
    "forgotten" -> "forget", "heard" -> "hear", "sought" -> "seek",
    "fought" -> "fight", "sat" -> "sit", "won" -> "win",
    // "bit" deliberately NOT mapped to "bite": like ground/rose/bound it
    // is overwhelmingly a noun in technical text, and mapping only the
    // bare form would split it from "bits" (whose s-rule output "bit"
    // stays unmapped) — the ambiguous-head-word exclusion policy applies
    "bitten" -> "bite", "bled" -> "bleed",
    "crept" -> "creep", "dealt" -> "deal", "dug" -> "dig",
    "fled" -> "flee", "hung" -> "hang", "laid" -> "lay",
    "lent" -> "lend", "lit" -> "light", "spun" -> "spin",
    "clung" -> "cling", "sprang" -> "spring", "sprung" -> "spring",
    "goes" -> "go", "heroes" -> "hero", "potatoes" -> "potato",
    "tomatoes" -> "tomato", "echoes" -> "echo")

  /** Head-word subset: protected words (returned unchanged) and the
   * e-final vocabulary that licenses e-restoration after -ed / -ing / -es
   * removal. */
  val Lexicon: Set[String] = Set(
    // protected: look inflected but are head words
    "species", "series", "news", "bus", "plus", "analysis", "basis",
    "thesis", "crisis", "physics", "mathematics", "statistics", "economics",
    "politics", "ethics", "always", "perhaps", "its", "this", "his", "is",
    "was", "has", "does", "yes", "gas", "alias", "atlas", "bias", "canvas",
    "christmas", "campus", "status", "virus", "census", "corpus", "focus",
    "bonus", "genus", "chaos", "lens", "tennis",
    "thing", "king", "sing", "ring", "spring", "string", "bring", "wing",
    "swing", "sting", "cling", "fling", "during", "morning", "evening",
    "nothing", "something", "anything", "everything", "sibling", "ceiling",
    "darling", "dumpling", "herring", "lightning", "pudding", "shilling",
    "willing", "cunning", "sterling",
    "red", "bed", "fed", "led", "wed", "shed", "sled", "bred", "speed",
    "need", "feed", "seed", "deed", "reed", "breed", "creed", "greed",
    "indeed", "hundred", "sacred", "hatred", "kindred", "naked", "wicked",
    "rugged", "wretched", "crooked", "united", "infrared",
    // e-final vocabulary: licenses e-restoration
    "use", "file", "make", "take", "give", "come", "write", "have", "live",
    "move", "save", "serve", "time", "care", "share", "change", "charge",
    "close", "cause", "create", "store", "merge", "manage", "note", "name",
    "place", "trace", "race", "face", "page", "line", "pipe", "code",
    "type", "state", "date", "rate", "gate", "late", "value", "issue",
    "argue", "queue", "route", "cache", "delete", "update", "compute",
    "execute", "compile", "invoke", "provide", "decide", "divide", "guide",
    "hide", "ride", "side", "size", "include", "exclude", "reduce",
    "produce", "introduce", "announce", "balance", "advance", "enhance",
    "replace", "release", "increase", "decrease", "lease", "please",
    "parse", "browse", "response", "base", "case", "phrase", "praise",
    "raise", "rise", "wise", "use", "fuse", "house", "mouse", "pause",
    "engage", "image", "message", "package", "stage", "usage", "storage",
    "language", "arrange", "exchange", "range", "orange", "challenge",
    "machine", "define", "combine", "examine", "determine", "imagine",
    "engine", "one", "none", "zone", "phone", "tone", "stone", "bone",
    "done", "scene", "gene", "module", "rule", "schedule", "scale",
    "sample", "example", "couple", "people", "simple", "table", "enable",
    "disable", "handle", "bundle", "single", "circle", "cycle", "style",
    "square", "compare", "prepare", "declare", "score", "core", "more",
    "before", "explore", "ignore", "restore", "measure", "ensure",
    "capture", "feature", "figure", "future", "nature", "picture",
    "structure", "configure", "require", "acquire", "desire", "fire",
    "hire", "wire", "expire", "retire", "entire", "secure", "cure", "pure",
    "die", "tie", "lie", "pie", "free", "tree", "see", "agree", "degree",
    "three", "knee", "bee", "fee", "flee", "glee", "guarantee",
    "believe", "receive", "achieve", "leave", "weave", "drive", "arrive",
    "derive", "survive", "active", "native", "positive", "negative",
    "relative", "love", "above", "improve", "prove", "remove", "approve",
    "solve", "resolve", "involve", "evolve", "observe", "reserve",
    "preserve", "deserve", "curve", "nerve", "carve", "starve", "waste",
    "taste", "paste", "vote", "quote", "promote", "write", "invite",
    "site", "suite", "white", "polite", "definite", "favorite", "finite",
    "unite", "bite", "cite", "excite", "edit", "smile", "while", "mile",
    "pile", "tile", "profile", "mobile", "fragile", "give", "love", "dove",
    "gaze", "blaze", "freeze", "squeeze", "breeze", "seize", "organize",
    "realize", "recognize", "analyze", "optimize", "minimize", "maximize",
    "summarize", "initialize", "normalize", "serialize", "tokenize",
    "customize", "utilize", "memorize", "authorize", "categorize",
    "prioritize", "stabilize", "visualize", "synchronize", "standardize",
    "generalize", "specialize", "capitalize", "centralize", "finalize",
    "validate", "operate", "generate", "iterate", "integrate", "migrate",
    "separate", "evaluate", "estimate", "calculate", "simulate",
    "accumulate", "populate", "translate", "relate", "locate", "allocate",
    "indicate", "duplicate", "replicate", "communicate", "complicate",
    "navigate", "aggregate", "delegate", "investigate", "mitigate",
    "propagate", "negotiate", "initiate", "associate", "appreciate",
    "terminate", "eliminate", "dominate", "coordinate", "originate",
    "designate", "participate", "anticipate", "concentrate", "demonstrate",
    "illustrate", "orchestrate", "celebrate", "collaborate", "decorate",
    "incorporate", "accelerate", "tolerate", "moderate", "enumerate",
    "configure", "assemble", "resemble", "double", "trouble",
    "little", "middle", "title", "battle", "bottle", "subtle", "article",
    "particle", "vehicle", "obstacle", "miracle", "muscle", "puzzle",
    "large", "huge", "edge", "judge", "bridge", "knowledge", "badge",
    "dodge", "pledge", "hedge", "wedge", "urge", "surge", "purge", "forge",
    "verge", "emerge", "submerge", "converge", "diverge",
    // round-5 protected function words the es/s rules would mangle
    // ("these" → "thes", "whereas" → "wherea"); Lucene's full lexicon
    // protects them as head entries
    "these", "whereas") ++ LexiconGrowth ++ LexiconGrowth5

  /** Round-4 lexicon growth (VERDICT r03 next-round #3): ~300 additional
   * common-English e-final head words curated from general public
   * vocabulary — every entry is a BASE form (never an inflected one, which
   * would wrongly protect it), so each addition can only (a) license
   * e-restoration for its -ed/-ing/-es inflections and (b) harmlessly
   * protect the already-uninflected base. Coverage is measured by
   * KStemSpec's derived-inflection round-trip and recorded in SURVEY §8. */
  private[graft] def LexiconGrowth: Set[String] = Set(
    "abide", "abuse", "accuse", "ache", "admire", "advise", "agitate",
    "alleviate", "amaze", "amuse", "arbitrate", "arcade", "archive",
    "arise", "aspire", "assume", "assure", "attribute", "automate",
    "average", "bake", "bale", "bare", "barge", "bathe", "battle",
    "behave", "blade", "blame", "bounce", "brace", "brake", "brave",
    "breathe", "bribe", "bride", "bruise", "bubble", "budge", "bulge",
    "cable", "cage", "cake", "capture", "cease", "chase", "choke",
    "chore", "clause", "cleanse", "clone", "clothe", "collide", "commute",
    "compete", "complete", "compose", "compromise", "conclude", "condense",
    "confide", "confine", "confuse", "console", "conspire", "constitute",
    "consume", "continue", "contribute", "convince", "cope", "corrode",
    "costume", "crane", "crave", "crime", "criticize", "crumble", "cube",
    "cuddle", "damage", "dance", "dare", "daze", "debate", "decade",
    "decline", "dedicate", "deduce", "defuse", "degrade", "deliberate",
    "describe", "devote", "dictate", "dine", "dispose", "dispute",
    "distribute", "dive", "donate", "dose", "doze", "drape", "dribble",
    "ease", "educate", "elevate", "emigrate", "empire", "encode",
    "endorse", "enforce", "enrage", "ensue", "erase", "erode", "escape",
    "estate", "evade", "evoke", "exaggerate", "excuse", "exercise",
    "exhale", "expose", "fade", "fake", "fame", "fare", "fate", "fatigue",
    "fence", "finance", "fine", "flake", "flame", "flare", "force",
    "forgive", "frame", "fringe", "fume", "gamble", "game", "gesture",
    "giggle", "glance", "glide", "globe", "glue", "grace", "grade",
    "graduate", "grape", "grate", "grave", "graze", "grieve", "handle",
    "hate", "haze", "hesitate", "hike", "hinge", "hole", "home", "hope",
    "horse", "hose", "hype", "ignite", "imitate", "immigrate", "impose",
    "improvise", "incline", "indulge", "inflate", "inhale", "injure",
    "inquire", "inspire", "insure", "interfere", "intervene", "intrigue",
    "invade", "invoice", "isolate", "joke", "juggle", "kite", "lace",
    "lame", "lane", "lapse", "lecture", "legislate", "license", "like",
    "lime", "liberate", "lodge", "lounge", "lure", "mandate", "maze",
    "mediate", "mine", "mingle", "minute", "mistake", "mode", "motivate",
    "mumble", "mute", "narrate", "negate", "nibble", "nominate", "nose",
    "nudge", "nurse", "nurture", "oblige", "oppose", "outline", "owe",
    "pace", "parade", "pave", "perceive", "persuade", "phase", "pirate",
    "plane", "plate", "plunge", "poke", "pollute", "pose", "prescribe",
    "presume", "price", "pride", "probe", "promise", "pronounce",
    "propose", "pulse", "pursue", "quake", "rake", "rage", "rebate",
    "recede", "recite", "recline", "recycle", "refine", "refuse",
    "regulate", "rehearse", "reinforce", "relieve", "rename", "renovate",
    "rescue", "reside", "resume", "retrieve", "reuse", "reverse",
    "revise", "revive", "revoke", "rinse", "ripple", "rope", "rotate",
    "rumble", "sacrifice", "salute", "scare", "scope", "scrape",
    "scribble", "sense", "settle", "shade", "shake", "shame", "shape",
    "share", "shave", "shine", "shove", "shuffle", "skate", "slice",
    "slide", "slope", "smoke", "snore", "soothe", "sparkle", "spike",
    "stake", "stare", "stimulate", "stride", "strike", "stripe",
    "stroke", "struggle", "stumble", "subscribe", "substitute", "sue",
    "suppose", "surprise", "swipe", "tackle", "tame", "tape", "tease",
    "telephone", "theme", "thrive", "tide", "trade", "tremble", "tune",
    "underline", "undermine", "upgrade", "venture", "vibrate", "violate",
    "voice", "wade", "wage", "wave", "welcome", "wipe")

  /** Round-5 lexicon growth (VERDICT r04 next-round #2): ~370 further
   * common-English e-final BASE forms (same curation contract as
   * [[LexiconGrowth]] — never an inflected form), vetted mechanically by
   * KStemSpec's exhaustive derived-inflection round-trip over every e-final
   * head. Pushes lexicon-arbitrated e-restoration coverage further toward
   * the reference KStemFilter's ~30k-entry behavior. */
  private[graft] def LexiconGrowth5: Set[String] = Set(
    "abbreviate", "absolve", "accommodate", "acknowledge", "activate",
    "adore", "advocate", "alienate", "allege", "allude", "angle",
    "animate", "annotate", "annihilate", "apologize", "appraise",
    "approximate", "articulate", "assassinate", "assimilate", "attire",
    "attune", "authenticate", "avenge", "awake", "axe", "babble",
    "baffle", "baptize", "barbecue", "beverage", "bicycle", "blouse",
    "boggle", "bore", "braise", "bridle", "bronze", "buckle", "bungle",
    "calibrate", "candle", "canoe", "capsize", "captivate", "carriage",
    "cascade", "castle", "catalogue", "chafe", "chance", "chime",
    "chronicle", "chuckle", "circulate", "civilize", "cleave",
    "clique", "coincide", "collapse", "colonize", "commemorate",
    "commence", "compensate", "comprise", "conceive", "concede",
    "condone", "conjure", "connote", "conserve", "consolidate",
    "construe", "contemplate", "converse", "convene", "cooperate",
    "corroborate", "course", "crackle", "cradle", "crease", "cringe",
    "cripple", "critique", "cruise", "crusade", "cultivate", "culture",
    "curse", "dangle", "dazzle", "deceive", "decelerate", "decode",
    "decompose", "dilute", "deflate", "defame", "demote", "denote",
    "denounce", "deprive", "despise", "deteriorate", "detonate",
    "devastate", "deviate", "devise", "diagnose", "differentiate",
    "dilate", "disagree", "discharge", "disclose", "discourage",
    "disguise", "dislike", "dislodge", "dispense", "disperse",
    "displace", "dissolve", "doodle", "downgrade", "drizzle",
    "dwindle", "dye", "eclipse", "elaborate", "elude", "embrace",
    "emphasize", "empathize", "encase", "enclose", "encourage",
    "endure", "engrave", "enlarge", "enslave", "enterprise", "entice",
    "entitle", "envisage", "episode", "equate", "escalate", "evacuate",
    "evaporate", "excavate", "exile", "explode", "fable", "facilitate",
    "fascinate", "fertilize", "fiddle", "finesse", "fixate", "fizzle",
    "fluctuate", "fondle", "foresee", "formulate", "fracture",
    "franchise", "freelance", "fumble", "galvanize", "garage",
    "gargle", "gauge", "gentle", "germinate", "gobble", "goose",
    "gorge", "grapple", "grease", "grimace", "gripe", "groove",
    "grove", "grudge", "haggle", "hassle", "hibernate", "hitchhike",
    "hobble", "homepage", "hospitalize", "huddle", "humble",
    "humiliate", "hurdle", "hustle", "hydrate", "hygiene",
    "hypothesize", "idle", "idolize", "illuminate", "immerse",
    "impede", "implicate", "incense", "incinerate", "incite",
    "incubate", "infiltrate", "infuse", "innovate", "inscribe",
    "insinuate", "instigate", "institute", "insulate", "intercede",
    "interlace", "interrogate", "interstate", "intertwine",
    "intimidate", "inundate", "irrigate", "irritate", "jangle",
    "jingle", "jostle", "jumble", "kindle", "knuckle", "landscape",
    "lathe", "legitimize", "leverage", "lifestyle", "lifetime",
    "limestone", "literature", "litigate", "lunge", "magnetize",
    "magnitude", "manipulate", "marinate", "marble", "massage",
    "masquerade", "mature", "meddle", "meditate", "menace",
    "microscope", "microwave", "mileage", "mobilize", "modernize",
    "modulate", "moisturize", "monopolize", "morale", "motive", "mule",
    "multiple", "mutate", "muzzle", "mystique", "needle", "neutralize",
    "nickname", "noodle", "notice", "obligate", "obliterate",
    "obscure", "obsolete", "orchestrate", "oscillate", "outpace",
    "outrage", "outsource", "overcome", "overdose", "override",
    "oversee", "overtake", "overture", "oxide", "oxidize", "ozone",
    "paddle", "palace", "pancake", "parachute", "paralyze",
    "paraphrase", "passage", "pasture", "peddle", "penetrate",
    "perfume", "perspire", "pervade", "pickle", "pierce", "pine",
    "pinnacle", "pipeline", "plague", "poise", "polarize", "police",
    "postpone", "posture", "practice", "prance", "precede", "preclude",
    "predicate", "premiere", "prince", "principle", "privilege",
    "prize", "procedure", "procrastinate", "procure", "prosecute",
    "protrude", "provoke", "prune", "puddle", "puncture", "purchase",
    "purpose", "quadruple", "quarantine", "radiate", "raffle",
    "rampage", "rattle", "rave", "recipe", "reconcile", "recreate",
    "rectangle", "recuperate", "refuge", "regime", "reimburse",
    "rejoice", "rejuvenate", "relocate", "remake", "reminisce",
    "remote", "renegade", "rephrase", "reproduce", "reptile",
    "reschedule", "reshape", "resonate", "restructure", "retrace",
    "reunite", "revere", "revolve", "ridicule", "rifle", "romance",
    "rouse", "routine", "ruffle", "rummage", "rupture", "rustle",
    "sabotage", "saddle", "salvage", "saturate", "sauce", "sausage",
    "scheme", "scramble", "scrutinize", "sculpture", "seclude",
    "sedate", "seduce", "segregate", "sentence", "serenade", "service",
    "shackle", "shuttle", "signature", "silence", "sizzle", "sleeve",
    "smuggle", "snake", "sneeze", "sniffle", "snooze", "snuggle",
    "socialize", "spade", "spectacle", "speculate", "sphere", "spine",
    "spite", "splice", "sponge", "spouse", "sprinkle", "spruce",
    "stable", "stagnate", "stampede", "staple", "startle", "stature",
    "statue", "statute", "stereotype", "sterilize", "stifle",
    "stipulate", "stove", "straddle", "strangle", "streamline",
    "strive", "subdue", "subside", "subtitle", "suffice", "suffocate",
    "supervise", "suspense", "swerve", "syndicate", "syndrome",
    "synthesize", "tale", "tangle", "telescope", "template", "temple",
    "tense", "tentacle", "terrace", "textile", "texture", "trouble",
    "wrestle", "wrinkle")

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private def allLetters(w: String): Boolean = {
    var i = 0
    while (i < w.length) { if (w.charAt(i) < 'a' || w.charAt(i) > 'z') return false; i += 1 }
    true
  }

  private def hasVowel(w: String): Boolean = w.exists(isVowel)

  /** Word ends in a doubled consonant that undoubling may restore
   * ("stopped" → stopp → stop). Krovetz never undoubles -ll/-ss/-zz
   * ("falling" → fall, "passing" → pass). */
  private def doubledConsonant(w: String): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && !isVowel(w.charAt(n - 1)) &&
      w.charAt(n - 1) != 'l' && w.charAt(n - 1) != 's' && w.charAt(n - 1) != 'z'
  }

  private def inLex(w: String): Boolean = Lexicon.contains(w)

  /** Stem one lowercase token. Non-alphabetic or short tokens pass through
   * unchanged, as do lexicon head words (the paper's "check the lexicon
   * first" step). */
  def stem(word: String): String = stemWith(word, inLex)

  /** Rule-only outcome — what [[stem]] would return with an EMPTY lexicon
   * (irregular-form table still applies; it is a separate mechanism in the
   * paper). The lexicon-arbitration coverage statistic in KStemSpec is the
   * fraction of inflected forms where [[stem]] ≠ this. */
  def stemRuleOnly(word: String): String = stemWith(word, _ => false)

  private def stemWith(word: String, lex: String => Boolean): String = {
    if (word.length < 3 || !allLetters(word)) return word
    Exceptions.get(word) match {
      case Some(irregular) => return irregular
      case None            =>
    }
    if (lex(word)) return word

    // -- plural (paper step 1) --
    if (word.endsWith("ies") && word.length > 4)
      return word.substring(0, word.length - 3) + "y"           // cities → city
    if (word.endsWith("es") && word.length > 3 && !word.endsWith("sses")) {
      val keepE = word.substring(0, word.length - 1)            // merges → merge
      // e inserted after sibilant for pronunciation → drop "es" entirely,
      // unless the lexicon knows the e-final form
      if (lex(keepE)) return stemPast(keepE, lex)
      if (word.endsWith("ches") || word.endsWith("shes") ||
          word.endsWith("xes") || word.endsWith("zes"))
        return word.substring(0, word.length - 2)               // churches → church
      return keepE                                              // rule fallback: keep -e
    }
    if (word.endsWith("sses")) {
      // lexicon arbitrates -sse bases (finesses → finesse) before the
      // drop-es default (classes → class) — the paper's check-lexicon step
      val keepE = word.substring(0, word.length - 1)
      if (lex(keepE)) return stemPast(keepE, lex)
      return word.substring(0, word.length - 2)                 // classes → class
    }
    if (word.endsWith("s") && !word.endsWith("ss") && !word.endsWith("us") &&
        !word.endsWith("is") && word.length > 3)
      return stemPast(word.substring(0, word.length - 1), lex)  // tables → table

    stemPast(word, lex)
  }

  /** Past-tense and present-participle steps (paper steps 2-3), applied
   * after plural removal (covers "merged", "merging", "merges"). */
  private def stemPast(word: String, lex: String => Boolean): String = {
    if (word.length < 4 || lex(word)) return word

    if (word.endsWith("ied") && word.length > 4)
      return word.substring(0, word.length - 3) + "y"           // tried → try
    if (word.endsWith("ed") && word.length >= 4) {
      val base = word.substring(0, word.length - 2)
      if (!hasVowel(base)) return word
      if (doubledConsonant(base)) return base.substring(0, base.length - 1) // stopped → stop
      if (lex(base + "e")) return base + "e"                    // used → use
      return base                                               // walked → walk
    }
    if (word.endsWith("ing") && word.length >= 5) {
      val base = word.substring(0, word.length - 3)
      if (!hasVowel(base)) return word
      if (doubledConsonant(base)) return base.substring(0, base.length - 1) // running → run
      if (lex(base + "e")) return base + "e"                    // filing → file
      return base                                               // walking → walk
    }
    word
  }
}
