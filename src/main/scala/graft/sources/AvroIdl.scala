package graft.sources

import org.apache.avro.{Schema => AvroSchema}
import org.apache.spark.sql.types.StructType
import scala.collection.mutable

/** Avro IDL (`.avdl`) protocol parser — the reference's ACTUAL schema
  * artifact shape.
  *
  * The reference does not ship Avro JSON: its schema is an IDL protocol
  * (SnowFlakeTable.avdl:1-8, `@namespace(...) protocol SnowTableProtocol {
  * record SnowFlakeTable { string PRICE; ... } }`) compiled to a POJO by the
  * maven avro plugin at build time. `avro-compiler` (the upstream IDL
  * parser) is not on Spark's classpath, so this is a small self-contained
  * recursive-descent parser for the IDL subset a table-schema protocol
  * uses: records, enums, fixed, primitive types, `decimal(p,s)` /
  * `date` / `time_ms` / `timestamp_ms` / `uuid` logical shorthands,
  * `array<T>` / `map<T>` / `union { ... }` composites, the `T?` nullable
  * shorthand, named-type references between records, field defaults, and
  * `@annotation(...)` properties (skipped). Messages (`name(args)` RPC
  * declarations) are skipped — only the named types matter for ingest.
  *
  * Strategy: tokenize -> parse each named type -> emit canonical Avro JSON
  * -> feed ONE `Schema.Parser` instance in declaration order (so
  * cross-record references resolve) -> reuse [[AvroSchemaConverter]] for
  * the StructType mapping. One authoritative IDL→JSON→Spark path, no
  * duplicate type table.
  */
object AvroIdl {

  /** A parsed protocol: namespace + named-type schemas in declaration order. */
  final case class Protocol(namespace: Option[String], name: String,
      types: Seq[AvroSchema]) {
    def record(name: String): AvroSchema =
      types.find(t => t.getName == name || t.getFullName == name).getOrElse(
        throw new IllegalArgumentException(
          s"no type named '$name' in protocol ${this.name}; " +
            s"have ${types.map(_.getFullName).mkString(", ")}"))
    /** The protocol's sole record (the common table-export shape). */
    def soleRecord: AvroSchema = {
      val recs = types.filter(_.getType == AvroSchema.Type.RECORD)
      require(recs.size == 1,
        s"protocol $name has ${recs.size} records; name one explicitly")
      recs.head
    }
  }

  def parseProtocol(idl: String): Protocol =
    new Parser(tokenize(idl), baseDir = None, importChain = None).protocol()

  /** Parse a protocol FILE, resolving `import idl "…"` / `import schema "…"`
    * declarations against each file's own directory — the layout where a
    * shared record (e.g. the reference's SnowFlakeTable shape) lives in a
    * common `.avdl` imported by per-pipeline protocols. Imports resolve
    * TRANSITIVELY (r11; r10 was single-level): each imported IDL may import
    * further, relative to ITS directory, preserving per-file declaration
    * order and namespaces. An import CYCLE fails loudly with the full chain;
    * a DIAMOND (the same type arriving via two branches) is legal and
    * spliced once, but two DIFFERENT types sharing a short name fail loudly
    * (ambiguous reference). Unknown-type references stay as loud as in the
    * single-file path. */
  def parseProtocolFile(path: String): Protocol = {
    // real path (not just normalize()): the import-cycle check compares
    // chain members by identity, so a symlink alias of the root file must
    // land on the same Path as an import that reaches it the long way
    val p0 = java.nio.file.Paths.get(path).toAbsolutePath.normalize()
    val p = if (java.nio.file.Files.exists(p0)) p0.toRealPath() else p0
    val idl = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    new Parser(tokenize(idl), baseDir = Option(p.getParent),
      importChain = Some(List(p))).protocol()
  }

  /** IDL -> the named record's schema (or the sole record if unnamed). */
  def recordSchema(idl: String, record: String = ""): AvroSchema = {
    val p = parseProtocol(idl)
    if (record.isEmpty) p.soleRecord else p.record(record)
  }

  /** IDL -> Spark StructType for the named (or sole) record. */
  def toStructType(idl: String, record: String = ""): StructType =
    AvroSchemaConverter.toStruct(recordSchema(idl, record))

  // ---------------------------------------------------------------- lexer

  private sealed trait Tok
  private final case class Ident(s: String) extends Tok   // incl. dotted names
  private final case class Str(s: String) extends Tok
  private final case class Num(s: String) extends Tok
  private final case class Punct(c: Char) extends Tok     // { } < > ( ) , ; ? = @ [ ]

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src(i + 1) == '*') {
        val end = src.indexOf("*/", i + 2)
        require(end >= 0, "unterminated /* comment in IDL")
        i = end + 2
      } else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != '"') {
          if (src(i) == '\\' && i + 1 < n) { sb += src(i + 1); i += 2 }
          else { sb += src(i); i += 1 }
        }
        require(i < n, "unterminated string literal in IDL")
        i += 1
        out += Str(sb.toString)
      } else if (c.isDigit || (c == '-' && i + 1 < n && src(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (src(i).isDigit || src(i) == '.')) i += 1
        out += Num(src.substring(start, i))
      } else if (c.isLetter || c == '_' || c == '`') {
        // back-ticked identifiers escape IDL keywords (`error`, `date`, ...)
        val tick = c == '`'
        if (tick) i += 1
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_' ||
          (!tick && src(i) == '.'))) i += 1
        val s = src.substring(start, i)
        if (tick) { require(i < n && src(i) == '`', "unterminated back-tick"); i += 1 }
        out += Ident(s)
      } else if ("{}<>(),;?=@[]:".contains(c)) { out += Punct(c); i += 1 }
      else throw new IllegalArgumentException(
        s"unexpected character '$c' at offset $i in IDL")
    }
    out.result()
  }

  // --------------------------------------------------------------- parser

  /** @param importChain None for string parses (imports are a loud error —
    *        no directory to resolve against); Some(chain) for file parses,
    *        where `chain` is the normalized path stack from the root file to
    *        this one (head = this file) — the cycle detector. */
  private final class Parser(toks: Vector[Tok],
      baseDir: Option[java.nio.file.Path],
      importChain: Option[List[java.nio.file.Path]]) {
    private var pos = 0
    private def peek: Tok = if (pos < toks.length) toks(pos)
      else throw new IllegalArgumentException("unexpected end of IDL")
    private def next(): Tok = { val t = peek; pos += 1; t }
    private def expectPunct(c: Char): Unit = next() match {
      case Punct(`c`) =>
      case other => fail(s"expected '$c', got $other")
    }
    private def expectIdent(): String = next() match {
      case Ident(s) => s
      case other => fail(s"expected identifier, got $other")
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"IDL parse error at token $pos: $msg")

    /** `@name(<balanced>)` annotation; returns (name, rawTokens-dropped). */
    private def skipAnnotation(): String = {
      val name = expectIdent()
      if (peek == Punct('(')) skipBalanced('(', ')')
      name
    }

    /** Consume a balanced `open...close` token run (defaults, annotations). */
    private def skipBalanced(open: Char, close: Char): Unit = {
      expectPunct(open)
      var depth = 1
      while (depth > 0) next() match {
        case Punct(`open`)  => depth += 1
        case Punct(`close`) => depth -= 1
        case _ =>
      }
    }

    def protocol(): Protocol = {
      var namespace: Option[String] = None
      // leading annotations: @namespace("...") kept, others skipped
      while (peek == Punct('@')) {
        next()
        val saved = pos
        val name = expectIdent()
        if (name == "namespace") {
          expectPunct('(')
          namespace = next() match {
            case Str(s) => Some(s)
            case other  => fail(s"expected string in @namespace, got $other")
          }
          expectPunct(')')
        } else { pos = saved; skipAnnotation() }
      }
      next() match {
        case Ident("protocol") =>
        case other => fail(s"expected 'protocol', got $other")
      }
      val pname = expectIdent()
      expectPunct('{')
      val types = Seq.newBuilder[AvroSchema]
      val avroParser = new AvroSchema.Parser()
      // short name -> FULL name, declaration order. A map (not a set):
      // imported types keep their OWN namespace, so resolving a reference
      // must not re-qualify the short name against this protocol's one.
      val known = mutable.LinkedHashMap[String, String]()
      while (peek != Punct('}')) {
        // per-declaration annotations (e.g. @aliases) — skipped
        while (peek == Punct('@')) { next(); skipAnnotation() }
        peek match {
          case Ident("record") | Ident("error") =>
            next()
            val json = recordJson(namespace, known)
            types += avroParser.parse(json)
          case Ident("enum") =>
            next()
            val json = enumJson(namespace, known)
            types += avroParser.parse(json)
          case Ident("fixed") =>
            next()
            val json = fixedJson(namespace, known)
            types += avroParser.parse(json)
          case Ident("import") =>
            next()
            val kind = expectIdent()
            val file = next() match {
              case Str(s) => s
              case other  => fail(s"expected import file string, got $other")
            }
            expectPunct(';')
            val chain = importChain.getOrElse(fail(
              s"""import $kind "$file": imports need a file-based parse """ +
                "(parseProtocolFile) so relative paths resolve"))
            // cycle membership compares REAL paths: a symlink alias of a
            // file already on the chain must hit the loud cycle error, not
            // recurse to StackOverflow. Missing files keep the normalized
            // form so the does-not-exist failure still names the path.
            val resolved = baseDir.get.resolve(file).toAbsolutePath.normalize()
            val path =
              if (java.nio.file.Files.exists(resolved)) resolved.toRealPath()
              else resolved
            if (chain.contains(path)) fail(
              s"""import cycle: ${(path :: chain).reverse.mkString(" -> ")}""")
            if (!java.nio.file.Files.exists(path)) fail(
              s"""import $kind "$file": $path does not exist""")
            def readFile(): String = new String(
              java.nio.file.Files.readAllBytes(path),
              java.nio.charset.StandardCharsets.UTF_8)
            // splice an imported named type in ITS declaration order,
            // registering it with this protocol's parser under its own full
            // name (imported types keep their own namespace); a diamond —
            // the same type arriving twice via two branches — splices once,
            // two DIFFERENT types sharing a short name are a loud ambiguity
            def splice(t: AvroSchema): Unit = known.get(t.getName) match {
              case Some(full) if full == t.getFullName => // diamond: once
              case Some(full) => fail(
                s"ambiguous type name '${t.getName}': $full vs ${t.getFullName}")
              case None =>
                types += avroParser.parse(t.toString)
                known += t.getName -> t.getFullName
            }
            kind match {
              case "idl" =>
                // transitive: the sub-parser resolves ITS imports relative
                // to ITS directory, with this chain extended for cycles
                val sub = new Parser(tokenize(readFile()), Some(path.getParent),
                  importChain = Some(path :: chain)).protocol()
                sub.types.foreach(splice)
              case "schema" =>
                splice(new AvroSchema.Parser().parse(readFile()))
              case other => fail(
                s"unsupported import kind '$other' (idl and schema only)")
            }
          case _ =>
            // an RPC message declaration: `T name(args);` — skip to ';'
            while (peek != Punct(';')) next()
            next()
        }
      }
      Protocol(namespace, pname, types.result())
    }

    private def qname(ns: Option[String], n: String): String =
      ns.fold(n)(x => s"$x.$n")

    private def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString } + "\""

    private def recordJson(ns: Option[String], known: mutable.Map[String, String]): String = {
      val name = expectIdent()
      known += name -> qname(ns, name)
      expectPunct('{')
      val fields = Seq.newBuilder[String]
      while (peek != Punct('}')) {
        while (peek == Punct('@')) { next(); skipAnnotation() }
        val tpe = typeJson(ns, known)
        val fname = expectIdent()
        // optional default: `= <literal>;` — the literal may be a JSON
        // array/object; skip balanced brackets inside it
        if (peek == Punct('=')) {
          next()
          while (peek != Punct(';')) next() match {
            case Punct('[') => pos -= 1; skipBalanced('[', ']')
            case Punct('{') => pos -= 1; skipBalanced('{', '}')
            case _ =>
          }
        }
        expectPunct(';')
        fields += s"""{"name":${jstr(fname)},"type":$tpe}"""
        // drop any further same-statement fields? IDL has one field per ';'
      }
      next() // '}'
      val nsJson = ns.fold("")(x => s""","namespace":${jstr(x)}""")
      s"""{"type":"record","name":${jstr(name)}$nsJson,"fields":[${fields.result().mkString(",")}]}"""
    }

    private def enumJson(ns: Option[String], known: mutable.Map[String, String]): String = {
      val name = expectIdent()
      known += name -> qname(ns, name)
      expectPunct('{')
      val syms = Seq.newBuilder[String]
      while (peek != Punct('}')) next() match {
        case Ident(s)   => syms += jstr(s)
        case Punct(',') =>
        case other      => fail(s"unexpected $other in enum")
      }
      next()
      // optional default symbol: `= SYM;`
      if (peek == Punct('=')) { next(); expectIdent(); expectPunct(';') }
      val nsJson = ns.fold("")(x => s""","namespace":${jstr(x)}""")
      s"""{"type":"enum","name":${jstr(name)}$nsJson,"symbols":[${syms.result().mkString(",")}]}"""
    }

    private def fixedJson(ns: Option[String], known: mutable.Map[String, String]): String = {
      val name = expectIdent()
      known += name -> qname(ns, name)
      expectPunct('(')
      val size = next() match {
        case Num(s) => s
        case other  => fail(s"expected fixed size, got $other")
      }
      expectPunct(')')
      expectPunct(';')
      val nsJson = ns.fold("")(x => s""","namespace":${jstr(x)}""")
      s"""{"type":"fixed","name":${jstr(name)}$nsJson,"size":$size}"""
    }

    /** One IDL type expression -> Avro JSON type. */
    private def typeJson(ns: Option[String], known: mutable.Map[String, String]): String = {
      while (peek == Punct('@')) { next(); skipAnnotation() }
      val base = next() match {
        case Ident("boolean") => "\"boolean\""
        case Ident("int")     => "\"int\""
        case Ident("long")    => "\"long\""
        case Ident("float")   => "\"float\""
        case Ident("double")  => "\"double\""
        case Ident("bytes")   => "\"bytes\""
        case Ident("string")  => "\"string\""
        case Ident("null")    => "\"null\""
        case Ident("void")    => "\"null\""
        case Ident("date") =>
          """{"type":"int","logicalType":"date"}"""
        case Ident("time_ms") =>
          """{"type":"int","logicalType":"time-millis"}"""
        case Ident("timestamp_ms") =>
          """{"type":"long","logicalType":"timestamp-millis"}"""
        case Ident("local_timestamp_ms") =>
          """{"type":"long","logicalType":"local-timestamp-millis"}"""
        case Ident("uuid") =>
          """{"type":"string","logicalType":"uuid"}"""
        case Ident("decimal") =>
          expectPunct('(')
          val p = next() match { case Num(s) => s; case o => fail(s"decimal precision: $o") }
          expectPunct(',')
          val sc = next() match { case Num(s) => s; case o => fail(s"decimal scale: $o") }
          expectPunct(')')
          s"""{"type":"bytes","logicalType":"decimal","precision":$p,"scale":$sc}"""
        case Ident("array") =>
          expectPunct('<')
          val item = typeJson(ns, known)
          expectPunct('>')
          s"""{"type":"array","items":$item}"""
        case Ident("map") =>
          expectPunct('<')
          val v = typeJson(ns, known)
          expectPunct('>')
          s"""{"type":"map","values":$v}"""
        case Ident("union") =>
          expectPunct('{')
          val branches = Seq.newBuilder[String]
          branches += typeJson(ns, known)
          while (peek == Punct(',')) { next(); branches += typeJson(ns, known) }
          expectPunct('}')
          s"[${branches.result().mkString(",")}]"
        case Ident(ref) =>
          // named-type reference: resolve against declared types (emit the
          // full name so the shared Schema.Parser finds it); dotted names
          // pass through as-is
          if (ref.contains('.')) jstr(ref)
          else if (known.contains(ref)) jstr(known(ref))
          else fail(s"unknown type '$ref' (not a primitive, not declared yet)")
        case other => fail(s"expected a type, got $other")
      }
      // nullable shorthand `T?` -> ["null", T]
      if (peek == Punct('?')) { next(); s"""["null",$base]""" }
      else base
    }
  }
}
